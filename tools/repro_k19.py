import sys, os, traceback
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
sys.path.insert(0, os.path.join(REPO, "tools"))
from measure_round3 import make_module

k = int(sys.argv[1]) if len(sys.argv) > 1 else 19
prec = sys.argv[2] if len(sys.argv) > 2 else "high"
mod = make_module(50000, precision=prec, imsize=64)
x = jax.random.normal(jax.random.PRNGKey(3), (8, 64, 64, 3))
try:
    out = jnp.sum(mod(0.45, x, k=k))
    print("OK", jax.device_get(out))
except Exception as e:
    traceback.print_exc()
    print("FULL ERROR REPR:")
    print(repr(e))
