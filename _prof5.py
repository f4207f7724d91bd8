import time, numpy as np, jax, jax.numpy as jnp
from pcd_reg_hregnet_tpu.ops.neighbors import pairwise_sqdist
key = jax.random.PRNGKey(0); B=8
pts = jax.random.uniform(key, (B, 8096, 3), minval=-40., maxval=40.)
q = pts[:, :1024]
def ptime(name, f, *a, n=40):
    g = jax.jit(lambda *aa: jax.tree_util.tree_leaves(f(*aa))[0].ravel()[:1])
    np.asarray(g(*a))
    t0=time.perf_counter()
    rs=[g(*a) for _ in range(n)]
    np.asarray(rs[-1])
    print(name, round((time.perf_counter()-t0)/n*1000,2), flush=True)
def ap(a,b,rr):
    d2 = pairwise_sqdist(a, b)
    v,i = jax.lax.approx_min_k(d2, 64, recall_target=rr)
    return v,i
for rr in (0.8, 0.85, 0.9, 0.95):
    ptime(f'approx rr={rr}', lambda a,b,r=rr: ap(a,b,r)[1][0,0,0], q, pts)
# recall check on TPU
d2 = pairwise_sqdist(q, pts)
nv, ei = jax.lax.top_k(-d2, 64); ei=np.asarray(ei)
for rr in (0.8, 0.85, 0.9):
    _, ai = jax.jit(lambda a,b,r=rr: ap(a,b,r))(q, pts); ai=np.asarray(ai)
    rec = np.mean([len(set(ai[b,m]) & set(ei[b,m]))/64 for b in range(2) for m in range(0,1024,53)])
    print(f'rr={rr} recall={rec:.4f}')
