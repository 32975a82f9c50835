import time, jax, jax.numpy as jnp, numpy as np
N, M = 4096, 116
bank = jnp.asarray(np.random.randint(0, 2**30, (N, M)).astype(np.int32))
bankT = jnp.asarray(np.asarray(bank).T.copy())
idx0 = jnp.asarray(np.random.randint(0, M, (N,), dtype=np.int32))

def bench(name, body, iters=3000):
    f = jax.jit(lambda c: jax.lax.scan(lambda c,_: (body(c), None), c, None, length=iters)[0])
    r = f(idx0); _ = np.asarray(r)
    t=time.time(); r = f(idx0); _ = np.asarray(r)
    print(f"{name}: {(time.time()-t)/iters*1e6:.2f} us/iter", flush=True)

ii = jnp.arange(M, dtype=jnp.int32)[None, :]
iiT = jnp.arange(M, dtype=jnp.int32)[:, None]

def a(c):
    i = c % M
    v = jnp.sum(jnp.where(ii == i[:, None], bank, 0), axis=1)
    return (c + v) & 0x7fffffff
bench("a: where+sum axis1", a)

def b(c):
    i = c % M
    v = jnp.sum(jnp.where(iiT == i[None, :], bankT, 0), axis=0)
    return (c + v) & 0x7fffffff
bench("b: transposed, sum axis0", b)

def d(c):
    i = c % M
    v = jnp.sum(bank * (ii == i[:, None]).astype(jnp.int32), axis=1)
    return (c + v) & 0x7fffffff
bench("d: mul+sum", d)

def e(c):  # f32 dot (split exactness ignored; perf probe only)
    i = c % M
    oh = (ii == i[:, None]).astype(jnp.float32)
    v = jnp.einsum("nk,nk->n", oh, bank.astype(jnp.float32))
    return (c + v.astype(jnp.int32)) & 0x7fffffff
bench("e: f32 einsum", e)

def g(c):  # two-stage: [N,116]->[N,4,29]
    i = c % M
    b3 = jnp.pad(bank, ((0,0),(0,0)))
    v = jnp.sum(jnp.where(ii == i[:, None], bank, 0).reshape(N, 4, 29), axis=(1,2))
    return (c + v) & 0x7fffffff
bench("g: reshape reduce", g)
