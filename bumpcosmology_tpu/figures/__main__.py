"""Figure CLI: ``python -m bumpcosmology_tpu.figures <name|all> [options]``.

Resolves each figure's default input artifact from ``--data-dir`` (see
``bumpcosmology_tpu.figures.plots.FIGURES``); missing artifacts skip that
figure with a note (matching the reference CI's cached-artifact behavior).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

# Figures are host-side matplotlib work; any JAX evaluation they trigger
# (e.g. the PISN-bump sensitivity curves) runs on CPU so figure generation
# never contends for the (single-claim) TPU.
import jax

jax.config.update("jax_platforms", "cpu")

from bumpcosmology_tpu.figures.plots import FIGURES  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(prog="bumpcosmology_tpu.figures", description=__doc__)
    parser.add_argument("names", nargs="+", help=f"figure names or 'all'; known: {sorted(FIGURES)}")
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--out-dir", default="figures")
    parser.add_argument("--fmt", default="pdf", choices=["pdf", "png"])
    args = parser.parse_args(argv)

    names = sorted(FIGURES) if args.names == ["all"] else args.names
    rc = 0
    for name in names:
        if name not in FIGURES:
            print(f"[figures] unknown figure {name!r}", file=sys.stderr)
            rc = 2
            continue
        fn, artifact = FIGURES[name]
        out = Path(args.out_dir) / f"{name}.{args.fmt}"
        if artifact is None:
            fn(out=out)
        else:
            src = Path(args.data_dir) / artifact
            if not src.exists():
                print(f"[figures] {name}: missing input {src}, skipping")
                continue
            fn(src, out=out)
        print(f"[figures] wrote {out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
