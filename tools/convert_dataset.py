"""Dataset conversion: text/CSV robot logs -> the native .eslg format.

The reference ecosystem feeds eslam from Rock log streams; for this
engine the exchange formats are plain text files, converted once into
the binary log (``native/eslam_log.cpp``) that the streaming runner
batch-loads.

Supported inputs (all optional, merged by timestamp):

* ``--trajectory``: TUM-style ``ts x y z qx qy qz qw`` lines ->
  POSE (+ ORIENTATION) records.  ``ts`` in seconds (float).
* ``--contacts``: CSV ``ts,idx,x,y,z,contact,group`` — one line per
  contact candidate; lines sharing ``ts`` form one CONTACT_STATE
  (candidates ordered by ``idx``; every state must have the same
  candidate count).
* ``--scans``: CSV ``ts,start_angle,angular_resolution,r0,r1,...`` ->
  LASER_SCAN records.

Usage:
  python tools/convert_dataset.py out.eslg --trajectory tum.txt \
      --contacts contacts.csv --scans scans.csv
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def read_trajectory(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.replace(",", " ").split()]
            if len(v) < 8:
                raise ValueError(f"trajectory line needs 8 fields: {line}")
            rows.append(v[:8])
    return np.asarray(rows, np.float64)


def read_contacts(path):
    frames = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = line.split(",")
            ts = float(v[0])
            frames.setdefault(ts, []).append(
                (int(v[1]), [float(v[2]), float(v[3]), float(v[4])],
                 float(v[5]), int(v[6]))
            )
    return frames


def read_scans(path):
    scans = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split(",")]
            scans.append((v[0], v[1], v[2], np.asarray(v[3:], np.float32)))
    return scans


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("output")
    ap.add_argument("--trajectory")
    ap.add_argument("--contacts")
    ap.add_argument("--scans")
    args = ap.parse_args()
    if not (args.trajectory or args.contacts or args.scans):
        ap.error("provide at least one input file")

    from slam_eslam_tpu.core.state import BodyContactState
    from slam_eslam_tpu.io import logio

    records = []  # (ts_ns, kind, payload_args)
    if args.trajectory:
        for row in read_trajectory(args.trajectory):
            ts = int(row[0] * 1e9)
            pos = row[1:4]
            # TUM order qx qy qz qw -> ours (w, x, y, z)
            q = np.array([row[7], row[4], row[5], row[6]], np.float32)
            records.append((ts, "pose", (pos, q)))
            records.append((ts, "orientation", (q,)))
    if args.contacts:
        frames = read_contacts(args.contacts)
        counts = {len(v) for v in frames.values()}
        if len(counts) != 1:
            raise ValueError(
                f"contact states must share a candidate count; got {counts}"
            )
        for ts, pts in sorted(frames.items()):
            pts.sort(key=lambda p: p[0])
            cs = BodyContactState.create(
                np.asarray([p[1] for p in pts], np.float32),
                contact=np.asarray([p[2] for p in pts], np.float32),
                group_id=np.asarray([p[3] for p in pts], np.int32),
            )
            records.append((int(ts * 1e9), "contact", (cs,)))
    if args.scans:
        for ts, start, res, ranges in read_scans(args.scans):
            records.append((int(ts * 1e9), "scan", (ranges, start, res)))

    records.sort(key=lambda r: (r[0], {"orientation": 0, "contact": 1,
                                       "pose": 2, "scan": 3}[r[1]]))
    with logio.LogWriter(args.output) as w:
        for ts, kind, payload in records:
            if kind == "pose":
                w.write_pose(*payload, timestamp_ns=ts)
            elif kind == "orientation":
                w.write_orientation(*payload, timestamp_ns=ts)
            elif kind == "contact":
                w.write_contact_state(*payload, timestamp_ns=ts)
            elif kind == "scan":
                w.write_scan(*payload, timestamp_ns=ts)
    print(f"wrote {len(records)} records -> {args.output}")


if __name__ == "__main__":
    main()
