"""Pipeline CLI: ``python -m bumpcosmology_tpu.pipeline <stage...> [options]``.

Examples:
  python -m bumpcosmology_tpu.pipeline mock_injections mock.ndraw=100000
  python -m bumpcosmology_tpu.pipeline sample --data-dir /scratch/run1
  python -m bumpcosmology_tpu.pipeline all --config run.json --force
  python -m bumpcosmology_tpu.pipeline list
"""
from __future__ import annotations

import argparse
import sys

from bumpcosmology_tpu.pipeline.config import PipelineConfig
from bumpcosmology_tpu.pipeline.stages import build_pipeline

GROUPS = {
    "all": ["sample", "sample_cosmo", "figures", "report"],
    "mock": ["mock_year_samples"],
}


def main(argv=None):
    parser = argparse.ArgumentParser(prog="bumpcosmology_tpu.pipeline", description=__doc__)
    parser.add_argument("targets", nargs="+", help="stage names, 'all', 'mock', or 'list'")
    parser.add_argument("--config", default=None, help="JSON config file")
    parser.add_argument("--data-dir", default=None, help="artifact directory")
    parser.add_argument("--force", action="store_true", help="ignore artifact freshness")
    parser.add_argument(
        "--platform",
        default=None,
        help="force a JAX platform (e.g. 'cpu', 'tpu'); the analogue of the "
        "reference's set_host_device_count CPU runs (run_fit.py:17)",
    )
    parser.add_argument(
        "--host-devices",
        type=int,
        default=None,
        help="number of virtual CPU devices (chain/data mesh on CPU)",
    )
    parser.add_argument(
        "--rehearsal",
        action="store_true",
        help="offline fallback: if fetch leaves no usable inputs, generate "
        "format-faithful rehearsal fixtures (data/rehearsal.py) and complete "
        "the pipeline against them",
    )
    parser.add_argument(
        "--no-compile-cache",
        action="store_true",
        help="skip the persistent XLA compilation cache (on by default; "
        "repeat runs then recompile the ~1-2 min NUTS programs from scratch)",
    )
    args, overrides = parser.parse_known_args(argv)

    if not args.no_compile_cache:
        from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()

    if args.platform or args.host_devices:
        import jax

        if args.platform:
            jax.config.update("jax_platforms", args.platform)
        if args.host_devices:
            jax.config.update("jax_num_cpu_devices", args.host_devices)

    cfg = PipelineConfig.load(args.config, [o for o in overrides if "=" in o])
    if args.data_dir:
        cfg.paths.data_dir = args.data_dir
    if args.rehearsal:
        cfg.ingest.rehearsal_fallback = True

    pipe = build_pipeline(cfg)
    if args.targets == ["list"]:
        for name, stage in pipe.stages.items():
            status = "fresh" if stage.fresh() else "stale"
            print(f"{name:24s} [{status}] -> {', '.join(str(o) for o in stage.outputs)}")
        return 0

    from pathlib import Path

    Path(cfg.paths.data_dir).mkdir(parents=True, exist_ok=True)
    targets = []
    for t in args.targets:
        targets.extend(GROUPS.get(t, [t]))
    pipe.run(targets, force=args.force)
    return 0


if __name__ == "__main__":
    sys.exit(main())
