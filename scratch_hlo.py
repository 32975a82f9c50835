import os, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from defl_tpu.ops import inflate_batch as ib

N = 32
nbits = jnp.full((N,), 99999, jnp.int32)
cap = jnp.full((N,), 1024, jnp.int32)
limit = jnp.full((N,), 1 << 30, jnp.int32)

def one_chunk(st, ck):
    def sbody(st, _):
        loc0 = jnp.clip((st["bitpos"] >> 5) - ck["win_word"], 0, ib.WIN - ib.SMALL)
        small = ib._extract_small(ck["win"], loc0)
        small_base = ck["win_word"] + loc0
        toks = []
        for _u in range(ib.UNROLL):
            st, (tok, tok2) = ib._step(st, ck, small, small_base, nbits,
                                       cap, limit, 0, False)
            toks.append(tok); toks.append(tok2)
        return st, jnp.stack(toks)
    st, toks = jax.lax.scan(sbody, st, None, length=32)
    return st, toks

st0 = ib._init_scan_state(N); ck0 = ib._init_chunk_state(N)
txt = jax.jit(one_chunk).lower(st0, ck0).compile().as_text()
import re
for m in re.finditer(r".*dynamic-update-slice.*", txt):
    line = m.group(0).strip()
    if len(line) < 400:
        print(line[:240])
print("=== fusion defs with dynamic-update-slice:")
for m in re.finditer(r"fused_computation[^\n]*\n(?:[^\n]*\n){0,40}", txt):
    blk = m.group(0)
    if "dynamic-update-slice" in blk:
        for ln in blk.splitlines()[:6]:
            print("  ", ln.strip()[:220])
        print("   ---")
