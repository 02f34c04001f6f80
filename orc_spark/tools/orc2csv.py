"""orc2csv — print a ``.orc`` file as CSV on stdout.

CLI parity with the reference's tools/orc2csv/main.go:14-17 (``-f``
file, ``-c`` comma-separated column subset; no header row).  Rows
stream stripe-at-a-time through the pure-Python reader, so memory is
bounded by one stripe — the same property as the reference's cursor
loop.  This is the single-node debugging tool; distributed CSV export
of encoded stripe tables is ``operators/export.encoded_to_csv``.

Usage::

    python -m orc_spark.tools.orc2csv -f file.orc [-c col1,col2]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, (dict, list)):
        # containers flatten to JSON text (the reference's fmt.Sprint
        # prints Go map/slice syntax; JSON is the portable analog)
        return json.dumps(v, default=str)
    return str(v)


def main(argv=None, out=None) -> int:
    p = argparse.ArgumentParser(
        prog="orc2csv", description="convert an ORC file to CSV")
    p.add_argument("-f", dest="file", required=True,
                   help="the ORC file to convert")
    p.add_argument("-c", dest="cols", default="",
                   help="comma-separated columns to read (default all)")
    args = p.parse_args(argv)

    from ..sources.orcfile import ORCFile
    r = ORCFile(args.file)
    root = r.types[0]
    selected = [c.strip() for c in args.cols.split(",") if c.strip()] \
        or list(root.field_names)
    # dotted paths (r5) select nested struct leaves, matching
    # orc_scan's columns= grammar (reference GetField semantics)
    for c in selected:
        if "." in c:
            try:
                r.resolve_path(c)
            except ValueError as e:
                raise SystemExit(f"orc2csv: {e}")
        elif c not in root.field_names:
            raise SystemExit(f"orc2csv: no such column(s): [{c!r}]; "
                             f"file has {root.field_names}")
    r.select(*{c.split(".")[0] for c in selected})
    w = csv.writer(out or sys.stdout)

    def pick(row, path):
        v = row
        for seg in path.split("."):
            if v is None:
                return None
            v = v.get(seg)
        return v

    for row in r.read_all():
        w.writerow([_fmt(pick(row, c)) for c in selected])
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:
        # downstream closed early (e.g. `| head`): conventional exit,
        # with stdout redirected so the interpreter's flush-at-exit
        # doesn't raise again
        import os
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        raise SystemExit(141)
