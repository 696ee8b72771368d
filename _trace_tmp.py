import glob, gzip, json, collections, time
import jax, jax.numpy as jnp
from aphantasia_tpu.params.fft import FFTParameterizer
from aphantasia_tpu.ops.sampler import CutoutSampler
from aphantasia_tpu.ops.optim import build_optimizer
from aphantasia_tpu.models.clip.model import CLIP_CONFIGS, clip_init
from aphantasia_tpu.parallel.step import StepSettings, build_train_loop

size, samples = (720, 1280), 200
cfg = CLIP_CONFIGS["ViT-B/32"]
clip_params = clip_init(jax.random.PRNGKey(0), cfg)
clip_params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, clip_params)
par = FFTParameterizer(size, decay_power=1.5, colors=1.8)
sampler = CutoutSampler(size, samples, cfg.image_resolution, align="uniform", macro=0.4)
settings = StepSettings(sim="mix", transform="fast", total_steps=200, clip_dtype=jnp.bfloat16)
optimizer = build_optimizer("adam_custom", 0.05)
loop = build_train_loop(par, sampler, cfg, settings, optimizer, 10)
gen_params = par.init(jax.random.PRNGKey(1))
opt_state = optimizer.init(gen_params)
prev_enc = jnp.zeros((samples, cfg.embed_dim))
embs = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.embed_dim))
prompts = ((embs, jnp.ones((2,)), jnp.float32(-1.0)),)
key = jax.random.PRNGKey(3)

state = (gen_params, opt_state, prev_enc)
def run(state, k):
    gp, os_, pe, losses = loop(state[0], state[1], state[2], clip_params, None, None, prompts, k, jnp.int32(0))
    return (gp, os_, pe), losses
state, out = run(state, key); float(out[-1])
jax.profiler.start_trace("/tmp/jtrace")
state, out = run(state, key); float(out[-1])
jax.profiler.stop_trace()

files = glob.glob("/tmp/jtrace/**/*.trace.json.gz", recursive=True)
print(files)
ev_by_cat = collections.Counter()
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    # find device track pids
    pidname = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"].get("name", "")
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            pname = pidname.get(e["pid"], "")
            if "TPU" in pname or "tpu" in pname or "/device" in pname.lower():
                ev_by_cat[e["name"]] += e["dur"]
total = sum(ev_by_cat.values())
print("total device us:", total)
for name, us in ev_by_cat.most_common(40):
    print(f"{us/1e3:9.2f} ms  {100*us/max(total,1):5.1f}%  {name[:110]}")
