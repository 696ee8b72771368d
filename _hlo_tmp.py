import jax, jax.numpy as jnp
from aphantasia_tpu.params.fft import FFTParameterizer
from aphantasia_tpu.ops.sampler import CutoutSampler
from aphantasia_tpu.ops.optim import build_optimizer
from aphantasia_tpu.models.clip.model import CLIP_CONFIGS, clip_init
from aphantasia_tpu.parallel.step import StepSettings, build_train_step

size, samples = (720, 1280), 200
cfg = CLIP_CONFIGS["ViT-B/32"]
clip_params = clip_init(jax.random.PRNGKey(0), cfg)
clip_params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, clip_params)
par = FFTParameterizer(size, decay_power=1.5, colors=1.8)
sampler = CutoutSampler(size, samples, cfg.image_resolution, align="uniform", macro=0.4)
settings = StepSettings(sim="mix", transform="fast", total_steps=200, clip_dtype=jnp.bfloat16)
optimizer = build_optimizer("adam_custom", 0.05)
step = build_train_step(par, sampler, cfg, settings, optimizer)
gen_params = par.init(jax.random.PRNGKey(1))
opt_state = optimizer.init(gen_params)
prev_enc = jnp.zeros((samples, cfg.embed_dim))
embs = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.embed_dim))
prompts = ((embs, jnp.ones((2,)), jnp.float32(-1.0)),)
lowered = step.lower(gen_params, opt_state, prev_enc, clip_params, None, None, prompts, jax.random.PRNGKey(0), jnp.int32(0))
hlo = lowered.as_text()
open("/tmp/step.hlo","w").write(hlo)
import re
for m in re.finditer(r".*pad\(.*", hlo):
    line = m.group(0)
    if "200,64" in line or "200,50" in line:
        print(line.strip()[:220])
