"""Per-kernel trace profiling — the reference's ``bench_kineto`` analogue.

The reference times individual device kernels by capturing a torch_npu
profiler trace and aggregating event durations by kernel name
(``tests/python/deepep/utils.py:156-225``).  The TPU-native equivalent
captures a ``jax.profiler`` trace (xplane protobuf) and aggregates the
"XLA Ops" device-plane events — these carry the EXACT device-side duration
of every HLO op, including each ``pallas_call`` custom-call, with none of
the host/tunnel dispatch overhead that wall-clock timing must difference
away.  This is the ground-truth instrument for adjudicating scan-marginal
wall-clock numbers (VERDICT r4 #1).

Usage::

    table = kernel_table(lambda: f(x).block_until_ready(), iters=10)
    for row in table[:10]:
        print(row.name, row.avg_us, row.count)

Works over the axon tunnel (the profiler runs on the VM hosting the chip and
the xplane file lands locally).
"""

from __future__ import annotations

import dataclasses
import glob
import os
import re
import tempfile


@dataclasses.dataclass
class OpTime:
    """Aggregated device time for one HLO op name."""

    name: str        # short op name (the %xxx SSA name, fusion/custom-call)
    count: int       # number of executions in the trace
    total_us: float  # summed device time
    avg_us: float    # total / count
    hlo: str = ""    # one full HLO text sample (shapes, operands)


_NAME_RE = re.compile(r"%([\w.\-]+)\s*=")


def _short_name(event_name: str) -> str:
    m = _NAME_RE.match(event_name)
    return m.group(1) if m else event_name.split("(")[0].strip()[:80]


def capture(fn, iters: int = 10, trace_dir: str | None = None) -> str:
    """Run ``fn()`` ``iters`` times under the JAX profiler; return the xplane path.

    ``fn`` must block on its own results (``.block_until_ready()`` or a
    host fetch) so device work lands inside the trace window.
    """
    import jax

    d = trace_dir or tempfile.mkdtemp(prefix="jaxtrace_")
    fn()  # compile + warm OUTSIDE the trace
    with jax.profiler.trace(d):
        for _ in range(iters):
            fn()
    paths = sorted(
        glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise RuntimeError(f"no xplane.pb produced under {d}")
    return paths[-1]


def op_times(
    xplane_path: str,
    *,
    device_prefix: str = "/device:TPU",
    line_name: str = "XLA Ops",
) -> list[OpTime]:
    """Aggregate device-plane op durations by short op name, descending."""
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(xplane_path)
    agg: dict[str, list] = {}
    for plane in pd.planes:
        if not plane.name.startswith(device_prefix):
            continue
        for line in plane.lines:
            if line.name != line_name:
                continue
            for ev in line.events:
                key = _short_name(ev.name)
                row = agg.setdefault(key, [0, 0.0, ev.name])
                row[0] += 1
                row[1] += ev.duration_ns / 1e3
    out = [
        OpTime(name=k, count=c, total_us=round(t, 1),
               avg_us=round(t / max(c, 1), 2), hlo=h[:160])
        for k, (c, t, h) in agg.items()
    ]
    out.sort(key=lambda r: -r.total_us)
    return out


def module_times(
    xplane_path: str, *, device_prefix: str = "/device:TPU"
) -> list[OpTime]:
    """Aggregate per-XLA-module (whole jitted function) device durations."""
    return op_times(xplane_path, device_prefix=device_prefix,
                    line_name="XLA Modules")


def kernel_table(fn, iters: int = 10, top: int | None = None) -> list[OpTime]:
    """Capture + aggregate in one call; optionally truncate to ``top`` rows."""
    path = capture(fn, iters=iters)
    table = op_times(path)
    return table[:top] if top else table


def format_table(rows: list[OpTime], top: int = 20) -> str:
    lines = [f"{'op':<44} {'count':>6} {'avg_us':>10} {'total_us':>10}"]
    for r in rows[:top]:
        lines.append(f"{r.name[:44]:<44} {r.count:>6} {r.avg_us:>10.2f} "
                     f"{r.total_us:>10.1f}")
    return "\n".join(lines)
