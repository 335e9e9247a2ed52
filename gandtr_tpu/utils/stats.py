"""Progress meters, timers, resource accounting, code-version capture.

Counterpart of /root/reference/mdir/tools/stats.py: `AverageMeter` (stderr
progress + running average), `StopWatch` (named laps, logged as scalar/time
events), `ResourceUsage` (RAM / device memory / cumulative CPU+IO across
resumes), `CodeVersion` (git HEAD + package versions). Device metrics come
from jax instead of nvidia-smi; `trace` wraps a block in a jax.profiler trace
(the reference has no external profiler — SURVEY.md §5.1).
"""
import contextlib
import os
import subprocess
import sys
import time


class AverageMeter:
    """Running average + ETA progress printing (stats.py:12-45)."""

    def __init__(self, total=None, print_each=None, title=""):
        self.total = total
        self.print_each = print_each
        self.title = title
        self.reset()

    def reset(self):
        self.count = 0
        self.sum = 0.0
        self.start = time.time()

    @property
    def avg(self):
        return self.sum / max(self.count, 1)

    def update(self, value, n=1):
        self.count += n
        self.sum += value * n
        if self.print_each and (self.count % self.print_each == 0 or
                                self.count == self.total):
            elapsed = time.time() - self.start
            per = elapsed / max(self.count, 1)
            eta = (self.total - self.count) * per if self.total else 0
            print(f"\r>> {self.title} {self.count}/{self.total or '?'} "
                  f"avg {self.avg:.4f} ({per:.2f}s/it, eta {eta / 60:.1f}min)",
                  end="", file=sys.stderr)
            if self.count == self.total:
                print("", file=sys.stderr)


class StopWatch:
    """Named lap timer (stats.py:48-68): `lap(name)` accumulates the time since
    the previous lap under that name."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.laps = {}
        self._last = time.time()

    def lap(self, name):
        now = time.time()
        self.laps[name] = self.laps.get(name, 0.0) + (now - self._last)
        self._last = now
        return self.laps[name]

    def emit(self, logger, prefix="time"):
        for name, value in self.laps.items():
            logger(f"{prefix}/{name}", value, "scalar/time")


class ResourceUsage:
    """RAM / device memory / cumulative CPU+IO, resume-accumulating
    (stats.py:71-144). Device stats via jax.local_devices memory_stats."""

    def __init__(self, state=None):
        state = state or {}
        self.cpu_seconds_prev = state.get("cpu_seconds", 0.0)
        self.io_read_prev = state.get("io_read", 0)
        self._t0 = time.process_time()

    def snapshot(self):
        out = {"cpu_seconds": self.cpu_seconds_prev + time.process_time() - self._t0}
        try:
            import psutil
            p = psutil.Process()
            out["ram_gb"] = p.memory_info().rss / 1e9
            io = p.io_counters() if hasattr(p, "io_counters") else None
            if io:
                out["io_read"] = self.io_read_prev + io.read_bytes
        except Exception:
            pass
        try:
            import jax
            for i, d in enumerate(jax.local_devices()):
                ms = d.memory_stats() if hasattr(d, "memory_stats") else None
                if ms and "bytes_in_use" in ms:
                    out[f"device{i}_mem_gb"] = ms["bytes_in_use"] / 1e9
        except Exception:
            pass
        return out

    def state_dict(self):
        return self.snapshot()


class CodeVersion:
    """git HEAD + package versions (stats.py:147-189)."""

    def __init__(self, root=None):
        self.root = root or os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))

    def snapshot(self):
        out = {}
        try:
            out["git_head"] = subprocess.check_output(
                ["git", "rev-parse", "HEAD"], cwd=self.root,
                stderr=subprocess.DEVNULL).decode().strip()
            out["git_dirty"] = bool(subprocess.check_output(
                ["git", "status", "--porcelain"], cwd=self.root,
                stderr=subprocess.DEVNULL).decode().strip())
        except Exception:
            pass
        for pkg in ("jax", "flax", "optax", "numpy"):
            try:
                out[pkg] = __import__(pkg).__version__
            except Exception:
                pass
        return out


@contextlib.contextmanager
def trace(name, log_dir=None):
    """jax.profiler trace context for the hot loops (SURVEY.md §5.1 — the
    TPU-native replacement for the reference's homegrown timing)."""
    if log_dir:
        import jax
        with jax.profiler.trace(log_dir):
            yield
    else:
        sw = time.time()
        yield
        print(f">> trace[{name}]: {time.time() - sw:.3f}s", file=sys.stderr)
