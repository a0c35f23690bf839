"""Overlay training curves from TSV logs (ours and/or the reference's).

The log format is the reference's ``common/log.py`` TSV (which the
reference defines but never instantiates; this framework writes it live
as ``LOG_PATH/log.tsv``).  Ingestion rides ``utils/tsv_logger.Logger``'s
resume mode, so reference-written files load unchanged.

Usage:
  python scripts/compare_logs.py ours=/path/exp/run1/log.tsv \
      reference=/path/ref_exp/log.txt --metric "Test MPJPE" \
      --out curves.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffpose_tpu.utils.tsv_logger import Logger, savefig


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logs", nargs="+", metavar="LABEL=PATH",
                    help="labelled TSV logs to overlay")
    ap.add_argument("--metric", action="append", default=None,
                    help="column(s) to plot (default: every shared "
                    "non-Epoch column); repeatable")
    ap.add_argument("--out", default=None,
                    help="write a PNG instead of only printing the summary")
    args = ap.parse_args(argv)

    loggers = []
    for spec in args.logs:
        label, _, path = spec.partition("=")
        if not path:
            label, path = os.path.basename(os.path.dirname(spec)) or spec, spec
        loggers.append(Logger(path, title=label, resume=True))

    shared = [n for n in loggers[0].names
              if all(n in lg.names for lg in loggers) and n != "Epoch"]
    metrics = args.metric or shared
    for m in metrics:
        if any(m not in lg.names for lg in loggers):
            print(f"metric {m!r} missing from some logs "
                  f"(shared: {shared})", file=sys.stderr)
            return 1

    # Summary: final + best value per log per metric.
    width = max(len(lg.title) for lg in loggers)
    for m in metrics:
        print(f"== {m} ==")
        for lg in loggers:
            vals = [float(v) for v in lg.numbers[m]]
            vals = [v for v in vals if v == v]  # drop NaN rows
            if not vals:
                print(f"  {lg.title:<{width}}  (no finite values)")
                continue
            print(f"  {lg.title:<{width}}  final {vals[-1]:10.4f}   "
                  f"best {min(vals):10.4f}   epochs {len(vals)}")

    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6 * len(metrics), 4))
        for i, m in enumerate(metrics):
            plt.subplot(1, len(metrics), i + 1)
            for lg in loggers:
                ys = [float(v) for v in lg.numbers[m]]
                plt.plot(range(len(ys)), ys, label=lg.title)
            plt.title(m)
            plt.xlabel("epoch")
            plt.grid(True)
            plt.legend()
        plt.tight_layout()
        savefig(args.out)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
