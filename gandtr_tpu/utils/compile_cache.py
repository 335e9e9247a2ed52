"""Persistent XLA compilation cache.

The reference has no analog (torch eager); on TPU the first compile of each
graph shape costs 20-130 s, and scenario runs re-trace identical graphs every
invocation. Enabling JAX's persistent compilation cache amortizes this across
processes: compiled executables are keyed by HLO+flags and reloaded from disk.

Opt-in via `GANDTR_TPU_COMPILE_CACHE=<dir>` (or `=1` for the default
~/.cache/gandtr_tpu/xla); the scenario CLI and hub enable it automatically
when the env var is set.
"""
import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "gandtr_tpu",
                        "xla")


def enable_compilation_cache(directory=None, min_compile_secs=1.0):
    """Point JAX's persistent compilation cache at `directory`. Safe to call
    more than once; call before the first jit compilation for full effect."""
    import jax
    directory = directory or _DEFAULT
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return directory


def enable_from_env(var="GANDTR_TPU_COMPILE_CACHE"):
    """Enable the cache iff the env var is set ('1'/'true' -> default dir,
    anything else -> that path). Returns the cache dir or None."""
    val = os.environ.get(var, "").strip()
    if not val or val.lower() in ("0", "false", "no"):
        return None
    directory = None if val.lower() in ("1", "true", "yes") else val
    return enable_compilation_cache(directory)
