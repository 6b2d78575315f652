"""Device compute kernels (JAX/XLA/Pallas)."""

import os

_CACHE_SET = False


def enable_compilation_cache() -> None:
    """Point JAX at a persistent compilation cache (first compile of the
    fused pipelines costs minutes over the TPU tunnel; cached reloads are
    near-instant). Called lazily by the engines; opt out with
    SASSY_JAX_CACHE=0 or override the location with SASSY_JAX_CACHE=<dir>.
    """
    global _CACHE_SET
    if _CACHE_SET:
        return
    _CACHE_SET = True
    loc = os.environ.get("SASSY_JAX_CACHE", "")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "sassy_tpu", "jax",
        )
    try:
        import jax

        # TPU executables cache safely; XLA:CPU AOT results are machine-
        # feature-specific and can SIGILL when loaded on a different host
        if jax.default_backend() != "tpu":
            return
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only
