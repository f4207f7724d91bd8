import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from pcd_reg_hregnet_tpu.models import build
key = jax.random.PRNGKey(0); B=8
model = build('model_v6')
src = jax.random.uniform(key, (B, 8096, 3), minval=-40., maxval=40.)
dst = jax.random.uniform(jax.random.fold_in(key,1), (B, 8096, 3), minval=-40., maxval=40.)
variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(1), src[:1], dst[:1])

def run(tag, pick, n=30):
    @jax.jit
    def f(s, d):
        o = model.apply(variables, s, d, train=False)
        return pick(o)
    np.asarray(f(src, dst))
    t0=time.perf_counter()
    rs=[f(src, dst) for _ in range(n)]
    np.asarray(rs[-1])
    print(tag, round((time.perf_counter()-t0)/n*1000,2), flush=True)

S = lambda o: o['src_feats']
run('L1 det           ', lambda o: S(o)['xyz_1'][0,0,0]+S(o)['sigmas_1'][0,0])
run('L1 +desc_1(ptv3) ', lambda o: S(o)['desc_1'][0,0,0])
run('thru L2          ', lambda o: S(o)['desc_2'][0,0,0])
run('thru L3 (tower)  ', lambda o: S(o)['desc_3'][0,0,0])
run('both towers      ', lambda o: S(o)['desc_3'][0,0,0]+o['dst_feats']['desc_3'][0,0,0])
run('full             ', lambda o: o['rotation'][2][0,0,0]+o['translation'][2][0,0])
