import jax, jax.numpy as jnp, time, re, gzip, json, collections, glob
from vaevar_tpu.utils import compile_cache; compile_cache.enable()
from vaevar_tpu.config import VAE_DECODER
from vaevar_tpu.models.lgunet import LGUnet
from vaevar_tpu.utils.fast_init import fast_init
cfg = VAE_DECODER.replace(dtype=jnp.bfloat16)
m = LGUnet(cfg)
z = jnp.zeros((1,32,128,256), jnp.float32)
p = jax.device_put(fast_init(m, z, seed=0))
f = jax.jit(m.apply)
compiled = f.lower(p, z).compile()
txt = compiled.as_text()
meta = {}
for mm in re.finditer(r'%(\S+?) = [^\n]*metadata={op_name="([^"]+)"', txt):
    meta[mm.group(1)] = mm.group(2)
print("meta entries:", len(meta), flush=True)
o = f(p, z); float(jnp.sum(o))
jax.profiler.start_trace('/tmp/jt2')
for _ in range(5):
    o = f(p, z)
float(jnp.sum(o))
jax.profiler.stop_trace()
tr = sorted(glob.glob('/tmp/jt2/plugins/profile/*/vm.trace.json.gz'))[-1]
with gzip.open(tr) as fh: d = json.load(fh)
ev = d['traceEvents']
pids = {e['pid']: e['args'].get('name','') for e in ev if e.get('ph')=='M' and e.get('name')=='process_name'}
dev = {pp for pp,n in pids.items() if 'TPU' in n}
agg = collections.Counter()
raw = collections.Counter()
for e in ev:
    if e.get('ph')=='X' and e.get('pid') in dev and not e['name'].startswith('jit_'):
        nm = e['name'].lstrip('%')
        op = meta.get(nm, nm)
        op = re.sub(r'\d+', '#', op)
        agg[op] += e.get('dur',0)
        raw[e['name']] += e.get('dur',0)
print("total device by source op (us per fwd):")
tot = 0
for name, us in agg.most_common(30):
    tot += us
    print(f"{us/5:9.1f}  {name[:130]}")
print("SUM(top30):", tot/5)
