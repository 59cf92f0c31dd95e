import sys, os as _os; sys.path.insert(0, "/root/repo")
import os, time
os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")
import numpy as np, jax, jax.numpy as jnp
from hsi_dmgasr_tpu.io.convert_torch import load_torch_gae
from hsi_dmgasr_tpu.models import GAE
from hsi_dmgasr_tpu.pipeline import DMGASRPipeline
from hsi_dmgasr_tpu.train.ddpm_model import DDPMModel
import json, re
src = re.sub(r'//.*', '', open('/tmp/pavia_long_r2.json').read())
opt = json.loads(src)
gae_vars, cfg = load_torch_gae(opt['gae']['checkpoint'])
ddpm = DDPMModel(opt, seed=0)
pipe = DMGASRPipeline(opt, gae_vars, cfg, ddpm=ddpm)
rng = np.random.RandomState(0)
hr = rng.rand(4,128,128,102).astype(np.float32)
key = jax.random.PRNGKey(0)
# warm compile
l = pipe.train_step_from_hr(hr, scale=4, key=key); print("loss", float(l))
# timed: full path incl. upload (fresh array each iter)
t0=time.time()
N=10
for i in range(N):
    hr_i = hr + np.float32(i*1e-6)
    l = pipe.train_step_from_hr(hr_i, scale=4, key=key)
print("full path incl upload:", (time.time()-t0 + float(l)*0)/N, "s/step")
# fetch to sync
_ = float(l)
t0=time.time()
for i in range(N):
    hr_i = hr + np.float32(i*1e-6)
    l = pipe.train_step_from_hr(hr_i, scale=4, key=key)
_ = float(l)
print("synced:", (time.time()-t0)/N, "s/step")
# upload only
t0=time.time()
for i in range(N):
    x = jnp.asarray(hr + np.float32(i*1e-6))
    x.block_until_ready()
print("upload-ish:", (time.time()-t0)/N, "s (block may not block)")
# same-array repeat (executor caches identical calls? loss fetch forces)
t0=time.time()
for i in range(N):
    l = pipe.train_step_from_hr(hr, scale=4, key=key)
_ = float(l)
print("repeat same array:", (time.time()-t0)/N, "s/step")
