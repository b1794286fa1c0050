"""Profiler: a jax.profiler device trace + compiled-HLO cost analysis
around the test-set predict pass.

The reference wraps `torch.profiler.profile(profile_memory=True,
with_flops=True)` around `estimator.predict(test_X)` and writes a
per-op text table plus a JSON of totals — time, memory, FLOPS
(reference helper.py:391-396,442-487, main.py:116-117). The TPU
equivalents:
  * `jax.profiler.trace(workdir)` → a TensorBoard/Perfetto trace of the
    same predict pass (SURVEY.md §5 tracing);
  * `jit(...).lower().compile().cost_analysis()` → XLA's static FLOPs /
    bytes-accessed estimate for the FLOPS and memory fields;
  * wall-clock timing of the traced region for the time fields.

`save_profile` emits the same artifact pair (`<phase>_profile_table.txt`,
`<phase>_profile.json`) so downstream tooling keyed on the reference's
outputs keeps working.
"""
from __future__ import annotations

import contextlib
import time
from ..utils import create_if_missing, log, save_items, save_json


class ProfileRecord:
    """Collected measurements for one profiled region."""

    def __init__(self):
        self.wall_time_s: float = 0.0
        self.cost_analysis: dict = {}
        self.trace_dir: str | None = None
        self.compile_time_s: float = 0.0
        self.device: str = ""
        self.count: int = 0

    def add_cost(self, cost: dict | None):
        if not cost:
            return
        for k, v in cost.items():
            if isinstance(v, (int, float)):
                self.cost_analysis[k] = self.cost_analysis.get(k, 0.0) + v
        self.count += 1


@contextlib.contextmanager
def create_profiler(workdir: str | None = None, trace: bool = True):
    """Context manager yielding a ProfileRecord; optionally captures a
    jax.profiler trace into `<workdir>/jax_trace` (view in TensorBoard
    or Perfetto)."""
    import jax

    record = ProfileRecord()
    record.device = str(jax.devices()[0])
    trace_cm = contextlib.nullcontext()
    if trace and workdir:
        trace_dir = f"{workdir}/jax_trace"
        create_if_missing(trace_dir)
        record.trace_dir = trace_dir
        try:
            trace_cm = jax.profiler.trace(trace_dir)
        except Exception as e:  # tracing unsupported on some backends
            log(f"jax.profiler.trace unavailable: {e}")
    t0 = time.time()
    with trace_cm:
        yield record
    record.wall_time_s = time.time() - t0


def cost_analysis_of(fn, *args) -> dict:
    """Static XLA cost analysis of a jitted callable on given args."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        return dict(cost or {})
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")
        return {}


def save_profile(record: ProfileRecord, phase: str, workdir: str,
                 **kwargs) -> None:
    """Write `<phase>_profile_table.txt` + `<phase>_profile.json`
    (reference helper.py:442-487 artifact contract; fields renamed to
    their TPU equivalents, with the reference's totals preserved where
    they have a meaning here)."""
    log("Saving profile...")
    cost = record.cost_analysis
    flops = cost.get("flops", 0.0)
    bytes_accessed = cost.get("bytes accessed", 0.0)

    rows = [
        f"{'field':<32}{'value':>20}",
        "-" * 52,
        f"{'device':<32}{record.device:>20}",
        f"{'predict wall time (s)':<32}{record.wall_time_s:>20.4f}",
        f"{'XLA flops (static)':<32}{flops:>20.3e}",
        f"{'XLA bytes accessed':<32}{bytes_accessed:>20.3e}",
    ]
    for key in sorted(cost):
        if key in ("flops", "bytes accessed"):
            continue
        val = cost[key]
        if isinstance(val, (int, float)):
            rows.append(f"{key:<32}{val:>20.3e}")
    if record.trace_dir:
        rows.append(f"{'trace dir':<32}{record.trace_dir:>20}")
    save_items(rows, f"{workdir}/{phase}_profile_table.txt")

    details = {
        # Device/time totals (reference cpu_time/cuda_time analogues):
        "device": record.device,
        "device_time": record.wall_time_s * 1e6,  # µs, torch convention
        "device_time_str": f"{record.wall_time_s * 1e3:.3f}ms",
        "wall_time_s": record.wall_time_s,
        # Memory (XLA static bytes-accessed; HBM traffic estimate):
        "bytes_accessed": bytes_accessed,
        # FLOPS (XLA static count — torch's with_flops analogue):
        "flops": flops,
        # Others:
        "cost_analysis": {k: v for k, v in cost.items()
                          if isinstance(v, (int, float))},
        "trace_dir": record.trace_dir,
        "count": record.count,
    }
    save_json(details, f"{workdir}/{phase}_profile.json")
