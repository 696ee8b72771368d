"""Shared CLI plumbing: prompt encoding, sample-budget cascade, model setup.

Parity targets: the per-script closures the reference repeats in
clip_fft.py/illustra.py/illustrip.py/cppn.py (enc_text, xmem budget,
transform selection) — centralized here once.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from aphantasia_tpu.models.clip.model import (
    CLIP_CONFIGS, XMEM, load_clip, encode_text, encode_image, input_resolution)
from aphantasia_tpu.models.clip.tokenizer import tokenize
from aphantasia_tpu.params.color import clip_normalize
from aphantasia_tpu.ops.sampler import CutoutSampler


def apply_platform():
    """Make JAX_PLATFORMS from the user's environment win, and turn on the
    persistent compilation cache.

    Hosted TPU containers may pin the platform programmatically via
    jax.config at interpreter start (sitecustomize), which beats the env
    var — so `JAX_PLATFORMS=cpu python -m aphantasia_tpu.cli...` would
    silently run on the TPU.  The compile cache matters a lot for the CLI
    workflow: a fresh 720p clip_fft process spends minutes compiling what
    a previous run already compiled.  Called at the top of every CLI
    run()."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # backends already initialized — keep whatever is live
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "aphantasia_tpu",
                     "jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_PROGRAM_CACHE: dict = {}


def program_cache(key, builder):
    """In-process memo for built+jitted program bundles.

    A CLI `run()` builds fresh `jax.jit` wrappers every call, so a second
    run in the same process (notebook cell re-run, bench warm pass, fleet
    fan-out) pays the full Python retrace — ~7s for the fused illustrip
    frame program — even though the XLA executable itself comes back from
    the compilation cache.  Memoize the whole bundle keyed on every
    config field that shapes the traced program; entries hold stateless
    builders plus jitted callables (weights ride as call arguments), so
    reuse across runs is safe."""
    if key not in _PROGRAM_CACHE:
        _PROGRAM_CACHE[key] = builder()
    return _PROGRAM_CACHE[key]


def parse_size(size_str):
    """'1280-720' -> [720, 1280] (reference clip_fft.py:80-81)."""
    size = [int(s) for s in size_str.split("-")][::-1]
    if len(size) == 1:
        size = size * 2
    return size


def default_dtype():
    """bf16 on TPU, fp32 elsewhere."""
    return jnp.bfloat16 if jax.devices()[0].platform in ("tpu", "axon") else jnp.float32


def resolve_dtype(name: str):
    return {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
            "fp32": jnp.float32, "float32": jnp.float32,
            "auto": default_dtype()}[name]


class ClipWrapper:
    """A loaded CLIP model + its text/image encode conveniences."""

    def __init__(self, name: str, weights: str | None = None, key=None):
        self.name = name
        self.params, self.cfg = load_clip(name, weights, key=key)
        self.modsize = input_resolution(name)

    def enc_text(self, txt: str):
        """Prompt syntax `txt :w | txt2 :w2` -> (embs [K,D], weights [K])
        (reference clip_fft.py:143-154)."""
        embs, wts = [], []
        for subtxt in txt.split("|"):
            if ":" in subtxt:
                subtxt, wt = subtxt.split(":")
                wt = float(wt)
            else:
                wt = 1.0
            toks = tokenize(subtxt, context_length=self.cfg.context_length)
            emb = encode_text(self.params, self.cfg, jnp.asarray(toks))
            embs.append(np.asarray(emb)[0])
            wts.append(wt)
        return jnp.asarray(np.stack(embs)), jnp.asarray(wts, jnp.float32)

    def enc_image_sliced(self, img_np, samples, align, key):
        """Encode a reference image through the cutout sampler
        (clip_fft.py:211-218)."""
        img = jnp.asarray(img_np / 255.0, jnp.float32)
        img = jnp.transpose(img, (2, 0, 1))[None][:, :3]
        hw = img.shape[-2:]
        sampler = CutoutSampler(tuple(hw), samples, self.modsize, align)
        cuts = sampler(key, img)
        cuts = clip_normalize(cuts)
        emb = encode_image(self.params, self.cfg, cuts)
        return jnp.asarray(emb), img


def apply_sample_budget(samples: int, model: str, dualmod=None,
                        enforce: float = 0, sync: float = 0,
                        transform: str = "fast",
                        extra_prompts: int = 0) -> int:
    """The constant-memory sample multiplier cascade
    (clip_fft.py:125-127,134,156-169,187,199)."""
    if model in XMEM:
        samples = int(samples * XMEM[model])
    if dualmod is not None:
        samples = int(samples * 0.23)
    if enforce != 0:
        samples = int(samples * 0.5)
    if sync > 0:
        samples = int(samples * 0.5)
    if transform in ("elastic", "custom", "fast"):
        samples = int(samples * 0.95)
    for _ in range(extra_prompts):
        samples = int(samples * 0.75)
    return max(samples, 1)


def build_prompt_groups(groups):
    """[(embs, wts, coeff)] with numpy->jnp conversion; skips Nones."""
    out = []
    for g in groups:
        if g is None:
            continue
        embs, wts, coeff = g
        out.append((jnp.asarray(embs), jnp.asarray(wts),
                    jnp.asarray(coeff, jnp.float32)))
    return tuple(out)


def dualmod_steps(steps: int, dualmod: int):
    """Step indices handled by the second model (clip_fft.py:135)."""
    return set(list(range(steps))[dualmod::dualmod])


def add_parallel_flags(parser):
    """--mesh / --profile / --pallas, shared by every CLI (VERDICT r1 §6-7).

    --mesh 'N' shards the cutout batch over N devices (data parallel);
    --mesh 'NxM' additionally shards CLIP transformer weights over M
    devices (tensor parallel — for RN50x64/ViT-L scale towers)."""
    parser.add_argument('--mesh', default=None,
                        help="'N' = data-parallel cutouts over N devices; "
                             "'NxM' = data x model (tensor-parallel CLIP); "
                             "'dcn' = one data axis over EVERY process's "
                             "devices, hosts-outer (use with --fleet "
                             "R/W@coord — a single optimization spanning "
                             "hosts; only the generator-grad psum crosses "
                             "DCN)")
    parser.add_argument('--persp', default=None,
                        choices=['affine', 'mixed', 'exact'],
                        help="fast-pipeline perspective fidelity (measured "
                             "ladder, docs/TPU_MEASUREMENTS_r5.md §1: "
                             "affine 25.0 it/s / 0.993 embedding-cosine, "
                             "mixed 17.5 / 0.9997, exact 10.6 / 1). "
                             "Default: affine (equivalent env var: "
                             "APHANTASIA_EXACT_PERSP=mixed|1)")
    parser.add_argument('--profile', default=None,
                        help='Capture a jax.profiler trace into this directory')
    parser.add_argument('--pallas', action='store_true',
                        help='Use the Pallas VMEM-resident cutout kernel')
    parser.add_argument('--fleet', default=None,
                        help="multi-host fleet coordinates 'RANK/WORLD"
                             "[@COORDINATOR:PORT]' (or APHANTASIA_FLEET env); "
                             "with a coordinator, starts the JAX multi-process "
                             "runtime (DCN). Scene-level fan-out: illustra "
                             "shards scenes, interpol shards snapshot pairs; "
                             "other CLIs accept the runtime but run their "
                             "whole job per host")
    return parser


def apply_persp(a) -> None:
    """Resolve the --persp flag into the APHANTASIA_EXACT_PERSP knob
    ops/augs.get_transform reads (r5; flag wins over a pre-set env var).
    Call before any transform is built."""
    import os
    mode = getattr(a, 'persp', None)
    if mode is None:
        return
    if mode == 'affine':
        os.environ.pop('APHANTASIA_EXACT_PERSP', None)
    else:
        os.environ['APHANTASIA_EXACT_PERSP'] = (
            'mixed' if mode == 'mixed' else '1')


def setup_mesh(spec, clip_wrappers=(), verbose=True):
    """Build the mesh from a CLI spec and lay out CLIP params on it.

    Returns the Mesh (or None).  With a model axis, every ClipWrapper's
    params are resharded tensor-parallel in place, and the fused Pallas
    attention is disabled (XLA cannot partition the custom call; the plain
    einsum path partitions cleanly under SPMD)."""
    if not spec or str(spec) in ("0", "1"):
        return None
    from aphantasia_tpu.parallel.mesh import (make_mesh, make_mesh_2d,
                                              shard_clip_params)
    s = str(spec).lower()
    try:
        if s == "dcn":
            # single optimization spanning hosts (parallel/dcn.py): the
            # data axis covers every process's devices, hosts-outer, so
            # only the generator-grad psum crosses DCN
            from aphantasia_tpu.parallel.dcn import make_mesh_dcn
            mesh = make_mesh_dcn()
        elif "x" in s:
            dp, tp = (int(v) for v in s.split("x"))
            mesh = make_mesh_2d(dp, tp)
        else:
            mesh = make_mesh(int(s), axes=("data",))
    except ValueError as e:
        raise SystemExit(
            f"--mesh expects 'N' (data-parallel), 'NxM' (data x model) or "
            f"'dcn' (multi-host data axis), got {spec!r}: {e}") from None
    # any mesh: route attention through the einsum path — XLA's SPMD
    # partitioner cannot partition the fused Pallas custom call (it would
    # insert gathers at best, miscompile at worst, and we cannot exercise
    # real multi-chip SPMD on this single-chip box)
    import aphantasia_tpu.models.clip.model as clip_model
    clip_model.FUSED_ATTN = False
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        for w in clip_wrappers:
            if w is not None:
                w.params = shard_clip_params(w.params, mesh)
    if verbose:
        print(f" mesh: {dict(mesh.shape)}")
    return mesh


def maybe_translate(texts, enabled: bool, verbose=True):
    """--translate needs googletrans; exit loudly when it is unavailable
    (matches the reference, clip_fft.py:84-85 — a silent passthrough would
    feed untranslated text to CLIP without the user knowing)."""
    if not enabled:
        return texts
    try:
        from googletrans import Translator
    except ImportError:
        raise SystemExit(
            " --translate requires the googletrans package, which is not "
            "installed.\n Install it (`pip install googletrans`) or drop "
            "--translate and pass English prompts.\n This loud error (vs "
            "silently passing untranslated text to CLIP) is final, by "
            "design — see README 'translate'.")
    tr = Translator()
    if isinstance(texts, str):
        out = tr.translate(texts, dest="en").text
        if verbose:
            print(" translated to:", out)
        return out
    return [t.text for t in tr.translate(texts)]
