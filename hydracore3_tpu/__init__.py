"""hydracore3_tpu: TPU-native differentiable spectral path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
Ray-Tracing-Systems/HydraCore3 (see SURVEY.md for the reference analysis).
"""
import os as _os

__version__ = '0.2.0'

# Persistent XLA compilation cache: the fused whole-pass render programs are
# large (minutes of XLA time on a remote-relay TPU), so cache compiled
# executables across processes.  Overridable via HYDRACORE3_JAX_CACHE;
# disable with HYDRACORE3_JAX_CACHE=0.
_cache = _os.environ.get('HYDRACORE3_JAX_CACHE',
                         _os.path.expanduser('~/.cache/hydracore3_jax'))
if _cache != '0':
    import jax as _jax
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update('jax_compilation_cache_dir', _cache)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
        _jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:
        pass
