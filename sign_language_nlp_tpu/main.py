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
    args["workdir"] = format_dir(args.get("workdir"), **args)

    dump_args(args)
    setup_compilation_cache()

    # Multi-host init (no-op unless a coordinator is configured):
    initialize_distributed(args.get("dask_args"))

    from .pipeline import run

    return run(args)


if __name__ == "__main__":
    main(sys.argv[1:])
