"""Frame profiler: matched CPU + device timing scopes with a per-frame
report.

The analog of the reference's utils::Profiler
(/root/reference/src/utils/Profiler.hpp:19-327): GPU timestamp scopes 1:1
matched with CPU chrono scopes, read back a frame later, <=512 scopes,
displayed as a per-scope table. On TPU:
- CPU scope: perf_counter around the host-side section
- device scope: the same section's dispatched work is fenced with
  block_until_ready at scope exit when `sync` is requested (profiling
  mode), otherwise async dispatch time is attributed like the
  polled-later GPU queries (report reflects the previous frame)
- optional deep tracing via jax.profiler.trace into a directory
  (PROFILER_CPU_GPU_SCOPE's heavyweight sibling)

Usage:
    gprofiler.start_frame()
    with gprofiler.scope("GBuffer", device_arrays=gbuf):
        gbuf = render_gbuffer(...)
    report = gprofiler.end_frame()
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

MAX_SCOPES = 512


@dataclass
class ScopeData:
    name: str
    cpu_ms: float = 0.0
    device_ms: float = 0.0
    count: int = 0


@dataclass
class FrameReport:
    scopes: list[ScopeData] = field(default_factory=list)
    frame_cpu_ms: float = 0.0

    def table(self) -> str:
        lines = [f"{'scope':<28}{'cpu ms':>10}{'device ms':>12}"]
        for s in self.scopes:
            lines.append(f"{s.name:<28}{s.cpu_ms:>10.2f}{s.device_ms:>12.2f}")
        lines.append(f"{'frame':<28}{self.frame_cpu_ms:>10.2f}")
        return "\n".join(lines)


class Profiler:
    def __init__(self, sync_device: bool = False) -> None:
        self.sync_device = sync_device
        self._scopes: list[ScopeData] = []
        self._frame_start = 0.0
        self._previous: FrameReport | None = None
        self._trace_dir: str | None = None

    # -- frame protocol (Profiler::startCpuFrame/endFrame analog) --------

    def start_frame(self) -> None:
        self._scopes = []
        self._frame_start = time.perf_counter()

    def end_frame(self) -> FrameReport:
        report = FrameReport(
            scopes=self._scopes,
            frame_cpu_ms=(time.perf_counter() - self._frame_start) * 1e3,
        )
        self._previous = report
        return report

    def previous(self) -> FrameReport | None:
        """Like the reference's one-frame-later query readback."""
        return self._previous

    # -- scopes -----------------------------------------------------------

    @contextlib.contextmanager
    def scope(self, name: str, result=None):
        """CPU+device scope. Pass the scope's output arrays as `result`
        (or set them via .set_result) to fence device time in sync mode."""
        if len(self._scopes) >= MAX_SCOPES:
            yield lambda _res: None
            return
        data = ScopeData(name=name)
        holder = {}

        def set_result(res):
            holder["res"] = res

        t0 = time.perf_counter()
        yield set_result
        cpu_done = time.perf_counter()
        data.cpu_ms = (cpu_done - t0) * 1e3
        res = holder.get("res", result)
        if self.sync_device and res is not None:
            import jax

            jax.block_until_ready(res)
            data.device_ms = (time.perf_counter() - t0) * 1e3
        data.count = 1
        self._scopes.append(data)

    # -- deep tracing -------------------------------------------------------

    def start_trace(self, log_dir: str) -> None:
        import jax

        self._trace_dir = log_dir
        jax.profiler.start_trace(log_dir)

    def stop_trace(self) -> None:
        import jax

        jax.profiler.stop_trace()
        self._trace_dir = None


# global instance, mirroring utils::gProfiler
gprofiler = Profiler()


def device_op_report(trace_dir: str, top_n: int = 20, runs: int = 1):
    """Per-op DEVICE times from a jax.profiler trace directory.

    The productized form of the xplane analysis that drove the perf
    work (the reference's per-pass GPU timestamp queries,
    Profiler.hpp:19-327): wall-clock on this tunneled backend includes
    ~30-40 ms host dispatch per call, so only xplane events measure
    kernels truthfully. Returns [(op_name, total_ms / runs)] sorted desc.
    """
    import glob
    import os
    from collections import defaultdict

    from jax.profiler import ProfileData

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        return []
    data = ProfileData.from_file(paths[0])
    totals: dict[str, float] = defaultdict(float)
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "xla modules" in lname:
                continue
            for ev in line.events:
                totals[ev.name.split(" = ")[0]] += ev.duration_ns / 1e6
    out = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
    return [(name, ms / max(runs, 1)) for name, ms in out]


def profile_device_ops(fn, force, top_n: int = 20, runs: int = 2,
                       trace_dir: str = "/tmp/prosper_device_trace"):
    """Trace `runs` warm calls of fn and return the top device ops."""
    import shutil

    import jax

    force(fn())  # warm/compile
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(runs):
            force(fn())
    return device_op_report(trace_dir, top_n=top_n, runs=runs)
