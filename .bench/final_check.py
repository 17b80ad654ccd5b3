import sys; sys.path.insert(0, "/root/repo")
import jax
from __graft_entry__ import entry
fn, args = entry()
out = jax.jit(fn)(*args)
print("entry ok:", [getattr(o, "shape", None) for o in out], flush=True)
