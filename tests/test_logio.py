"""Native log runtime tests (writer/reader/async feeder)."""

import os

import numpy as np
import pytest

from slam_eslam_tpu.core.state import BodyContactState
from slam_eslam_tpu.io import logio


@pytest.fixture
def log_path(tmp_path):
    return str(tmp_path / "traverse.eslg")


def contact_state(i):
    pos = np.arange(12, dtype=np.float32).reshape(4, 3) + i
    return BodyContactState.create(
        pos,
        contact=np.array([1, 0, 1, 0], np.float32),
        group_id=np.array([0, 0, 1, 1], np.int32),
    )


class TestWriterReader:
    def test_roundtrip_all_types(self, log_path):
        with logio.LogWriter(log_path) as w:
            w.write_contact_state(contact_state(0), timestamp_ns=100)
            w.write_orientation([1.0, 0, 0, 0], timestamp_ns=200)
            w.write_scan([1.0, 2.0, 3.0], -0.5, 0.1, timestamp_ns=300)
            w.write_pose([1, 2, 3], [1, 0, 0, 0], timestamp_ns=400)

        with logio.LogReader(log_path) as r:
            assert len(r) == 4
            t, ts, buf = r.get(0)
            assert t == logio.CONTACT_STATE and ts == 100
            cs = logio.decode_contact_state(buf)
            np.testing.assert_allclose(
                np.asarray(cs.position),
                np.arange(12, dtype=np.float32).reshape(4, 3),
            )
            np.testing.assert_array_equal(
                np.asarray(cs.group_id), [0, 0, 1, 1]
            )

            t, ts, buf = r.get(1)
            assert t == logio.ORIENTATION
            np.testing.assert_allclose(
                logio.decode_orientation(buf), [1, 0, 0, 0]
            )

            t, ts, buf = r.get(2)
            ranges, start, res = logio.decode_scan(buf)
            np.testing.assert_allclose(ranges, [1, 2, 3])
            np.testing.assert_allclose([start, res], [-0.5, 0.1], rtol=1e-6)

            t, _, buf = r.get(3)
            pos, q = logio.decode_pose(buf)
            np.testing.assert_allclose(pos, [1, 2, 3])

    def test_out_of_range(self, log_path):
        with logio.LogWriter(log_path) as w:
            w.write_orientation([1.0, 0, 0, 0])
        with logio.LogReader(log_path) as r:
            with pytest.raises(IndexError):
                r.get(5)

    def test_open_missing(self, tmp_path):
        with pytest.raises(OSError):
            logio.LogReader(str(tmp_path / "nope.eslg"))

    def test_large_log(self, log_path):
        with logio.LogWriter(log_path) as w:
            for i in range(500):
                w.write_contact_state(contact_state(i), timestamp_ns=i)
        with logio.LogReader(log_path) as r:
            assert len(r) == 500
            _, ts, buf = r.get(499)
            assert ts == 499
            cs = logio.decode_contact_state(buf)
            np.testing.assert_allclose(float(cs.position[0, 0]), 499.0)


class TestAsyncFeeder:
    def test_streams_in_order(self, log_path):
        with logio.LogWriter(log_path) as w:
            for i in range(100):
                w.write_orientation([float(i), 0, 0, 0], timestamp_ns=i)
        with logio.LogReader(log_path) as r:
            with logio.AsyncFeeder(r, slots=4) as f:
                seen = []
                for t, ts, buf in f:
                    assert t == logio.ORIENTATION
                    seen.append(float(logio.decode_orientation(buf)[0]))
                np.testing.assert_allclose(seen, np.arange(100.0))

    def test_empty_log(self, log_path):
        with logio.LogWriter(log_path):
            pass
        with logio.LogReader(log_path) as r:
            with logio.AsyncFeeder(r) as f:
                assert list(f) == []


class TestBatchedAccess:
    """Native select/gather/compaction + the stacked-stream loader."""

    def _write_traverse(self, path, frames=12, scan_every=4, n_rays=8):
        with logio.LogWriter(path) as w:
            for i in range(frames):
                ts = 1000 + i * 10
                w.write_contact_state(contact_state(i), timestamp_ns=ts)
                w.write_orientation([1.0, 0, 0, float(i)], timestamp_ns=ts)
                w.write_pose([float(i), 0, 0], [1, 0, 0, 0],
                             timestamp_ns=ts)
                if i % scan_every == scan_every - 1:
                    w.write_scan(np.full(n_rays, 2.0 + i), -0.5, 0.1,
                                 timestamp_ns=ts + 1)

    def test_select_and_gather(self, log_path):
        self._write_traverse(log_path)
        with logio.LogReader(log_path) as r:
            assert r.count_type(logio.CONTACT_STATE) == 12
            idx, ts = r.select(logio.ORIENTATION)
            assert idx.size == 12
            np.testing.assert_array_equal(
                ts, 1000 + 10 * np.arange(12)
            )
            raw = r.gather(idx, 16)
            quats = np.frombuffer(raw.tobytes(), np.float32).reshape(-1, 4)
            np.testing.assert_allclose(quats[:, 3], np.arange(12.0))

    def test_compact_types_and_stride(self, log_path, tmp_path):
        self._write_traverse(log_path)
        dst = str(tmp_path / "compacted.eslg")
        n = logio.compact(
            log_path, dst,
            types=(logio.CONTACT_STATE, logio.ORIENTATION), stride=2,
        )
        assert n == 12  # 6 contact + 6 orientation
        with logio.LogReader(dst) as r:
            assert r.count_type(logio.CONTACT_STATE) == 6
            assert r.count_type(logio.ORIENTATION) == 6
            assert r.count_type(logio.POSE) == 0
            idx, _ = r.select(logio.CONTACT_STATE)
            _, _, buf = r.get(int(idx[1]))
            cs = logio.decode_contact_state(buf)
            # every 2nd record kept: record 1 is original frame 2
            np.testing.assert_allclose(
                np.asarray(cs.position)[0, 0], 2.0
            )

    def test_distance_image_roundtrip(self, log_path):
        img = np.random.default_rng(0).uniform(
            0.5, 3.0, (12, 16)
        ).astype(np.float32)
        with logio.LogWriter(log_path) as w:
            w.write_distance_image(img, 0.01, 0.02, -0.5, -0.4,
                                   timestamp_ns=7)
        with logio.LogReader(log_path) as r:
            t, ts, buf = r.get(0)
            assert t == logio.DISTANCE_IMAGE and ts == 7
            data, sx, sy, cx, cy = logio.decode_distance_image(buf)
            np.testing.assert_allclose(data, img)
            assert (sx, sy, cx, cy) == (
                pytest.approx(0.01), pytest.approx(0.02),
                pytest.approx(-0.5), pytest.approx(-0.4),
            )

    def test_dataset_converter(self, tmp_path):
        """tools/convert_dataset.py: TUM trajectory + contact/scan CSVs
        -> a loadable .eslg stream."""
        import subprocess
        import sys as _sys

        traj = tmp_path / "tum.txt"
        traj.write_text(
            "# ts x y z qx qy qz qw\n"
            "0.1 0.0 0.0 0.2 0 0 0 1\n"
            "0.2 0.1 0.0 0.2 0 0 0 1\n"
        )
        contacts = tmp_path / "contacts.csv"
        rows = []
        for ts in (0.1, 0.2):
            for i in range(4):
                rows.append(f"{ts},{i},{0.1*i},0.0,-0.1,1.0,{i//2}")
        contacts.write_text("\n".join(rows))
        scans = tmp_path / "scans.csv"
        scans.write_text("0.2,-0.5,0.1," + ",".join(["2.0"] * 8))
        out = str(tmp_path / "out.eslg")
        subprocess.run(
            [_sys.executable, "tools/convert_dataset.py", out,
             "--trajectory", str(traj), "--contacts", str(contacts),
             "--scans", str(scans)],
            check=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
        )
        s = logio.load_stream(out)
        assert s["contact"].shape == (2, 4)
        assert s["orientation"].shape == (2, 4)
        np.testing.assert_allclose(s["orientation"][0], [1, 0, 0, 0])
        assert s["pose"].shape == (2, 7)
        np.testing.assert_array_equal(np.nonzero(s["has_scan"])[0], [1])

    def test_load_stream(self, log_path):
        self._write_traverse(log_path, frames=12, scan_every=4, n_rays=8)
        s = logio.load_stream(log_path)
        assert s["contact"].shape == (12, 4)
        np.testing.assert_allclose(
            s["contact"]["position"][3, 0, 0], 3.0
        )
        assert s["orientation"].shape == (12, 4)
        np.testing.assert_allclose(s["orientation"][:, 3], np.arange(12.0))
        assert s["pose"].shape == (12, 7)
        # scans written at frames 3, 7, 11 attach to those frames
        np.testing.assert_array_equal(
            np.nonzero(s["has_scan"])[0], [3, 7, 11]
        )
        np.testing.assert_allclose(s["scan_ranges"][3], np.full(8, 5.0))
        np.testing.assert_allclose(s["scan_ranges"][2], 0.0)
        assert s["scan_meta"] == (pytest.approx(-0.5), pytest.approx(0.1))
