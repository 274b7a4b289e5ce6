"""Native log runtime tests (writer/reader/async feeder)."""

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
