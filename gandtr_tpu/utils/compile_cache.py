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


def enable_from_env(var="GANDTR_TPU_COMPILE_CACHE", default_on=False):
    """Enable the cache per the env var ('1'/'true' -> default dir, a path ->
    that path, '0'/'false' -> off). With `default_on`, an unset var enables
    the default dir (the scenario CLI does this: cross-process reuse cuts
    repeat eval/infer compiles from 20-130 s to seconds — verified through
    the tunnel backend). Returns the cache dir or None."""
    val = os.environ.get(var, "").strip()
    if val.lower() in ("0", "false", "no"):
        return None
    if not val:
        return enable_compilation_cache(None) if default_on else None
    directory = None if val.lower() in ("1", "true", "yes") else val
    return enable_compilation_cache(directory)
