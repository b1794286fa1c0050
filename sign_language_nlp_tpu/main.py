"""CLI entry point: `python -m sign_language_nlp_tpu.main --config <yaml>
[--flag value ...]`.

Same surface as the reference's `python main.py --config <yaml>`
(reference main.py:131-143): every YAML key doubles as a CLI flag, CLI
overrides YAML, the workdir template is expanded, resolved args are
dumped to `<workdir>/config.yaml`, and the run proceeds through grid
search and test. The Dask client bring-up (reference main.py:139) is
replaced by mesh construction + optional `jax.distributed` init inside
the pipeline.
"""
from __future__ import annotations

import sys

from .config import ARGUMENTS, load_args
from .parallel import initialize_distributed
from .utils import dump_args, format_dir, set_verbosity
from .utils.jaxtools import setup_compilation_cache


def main(argv=None) -> dict:
    # SLT_FORCE_CPU=1 pins the run to the host CPU platform (debug /
    # CI / quick verification without claiming the TPU tunnel):
    import os

    if os.environ.get("SLT_FORCE_CPU") == "1":
        from .utils.jaxtools import force_cpu

        force_cpu()

    args = load_args("SL Transformer (TPU)", ARGUMENTS, argv=argv)
    set_verbosity(int(args.get("verbose") or 1))

    # Multi-host init first (no-op unless a coordinator is configured):
    # the workdir must resolve identically on every process (manifest
    # shards merge through it) and only process 0 writes config.yaml.
    initialize_distributed(args.get("dask_args"))

    from .parallel import is_coordinator, process_info

    _, nproc = process_info()
    if nproc > 1 and "{datetime" in str(args.get("workdir") or ""):
        raise ValueError(
            "multi-host runs need a deterministic shared workdir: drop "
            "{datetime:...} from the workdir template (each process "
            "would expand it differently) and pass an explicit path")
    args["workdir"] = format_dir(args.get("workdir"), **args)

    if is_coordinator():
        dump_args(args)
    setup_compilation_cache()

    from .pipeline import run

    return run(args)


if __name__ == "__main__":
    main(sys.argv[1:])
