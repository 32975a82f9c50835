import os, sys, time, glob, gzip, json
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, zlib
from defl_tpu.ops import inflate_batch as ib
from defl_tpu.runtime.pack import pack_streams

N = 32
nbits = jnp.full((N,), 99999, jnp.int32)
cap = jnp.full((N,), 1024, jnp.int32)
limit = jnp.full((N,), 1 << 30, jnp.int32)

@jax.jit
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
st0["state"] = jnp.full((N,), ib.S_BHDR, jnp.int32)
r = one_chunk(st0, ck0); np.asarray(r[0]["bitpos"])
t0 = time.perf_counter()
with jax.profiler.trace("/tmp/jaxprof"):
    r = one_chunk(st0, ck0); np.asarray(r[0]["bitpos"])
print(f"profiled run: {time.perf_counter()-t0:.2f}s", flush=True)
# parse the trace: top ops by duration
files = glob.glob("/tmp/jaxprof/**/*.trace.json.gz", recursive=True)
ev = []
for f in files:
    with gzip.open(f) as fh:
        data = json.load(fh)
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 0:
            ev.append((e["dur"], e.get("name", "?")[:90]))
agg = {}
for d, n in ev:
    agg[n] = agg.get(n, 0) + d
for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{d/1e6:9.3f}s  {n}", flush=True)
