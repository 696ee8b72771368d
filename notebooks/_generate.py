"""Generate the four notebook UIs (parity with the reference Colabs:
Aphantasia.ipynb, Illustra.ipynb, IllusTrip3D.ipynb, CLIP_VQGAN.ipynb).

The reference notebooks re-implement the training loops inline as Colab
forms; here each notebook is a thin parameter form driving the matching
CLI's `run(get_args([...]))` entry point — same knobs, one code path.
Defaults are tiny so `jupyter nbconvert --execute` finishes in CI; the
comments say which values to raise for real renders.

Run `python notebooks/_generate.py` to (re)write the .ipynb files.
"""
import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))


def nb(title, intro, param_src, run_src, preview_src):
    n = nbf.v4.new_notebook()
    n.metadata["kernelspec"] = {"name": "python3", "display_name": "Python 3",
                                "language": "python"}
    n.cells = [
        nbf.v4.new_markdown_cell(f"# {title}\n\n{intro}"),
        nbf.v4.new_code_cell(
            "# make the repo importable when running from notebooks/\n"
            "import os, sys\n"
            "sys.path.insert(0, os.path.abspath('..'))\n"
            "os.environ.setdefault('APHANTASIA_QUIET', '')  # unset to silence banners\n"),
        nbf.v4.new_code_cell(param_src),
        nbf.v4.new_code_cell(run_src),
        nbf.v4.new_code_cell(preview_src),
    ]
    return n


PREVIEW = """\
# preview the last rendered frame
import glob
from IPython.display import Image, display
frames = sorted(glob.glob(os.path.join(out_dir, '**', '*.jpg'), recursive=True))
if frames:
    display(Image(filename=frames[-1]))
else:
    print('no frames found in', out_dir)
"""

APHANTASIA = nb(
    "Aphantasia — text to image (FFT / DWT)",
    "CLIP-guided image generation by optimizing an FFT spectrum (or DWT "
    "pyramid). Equivalent of the reference Aphantasia.ipynb Colab, driving "
    "the `clip_fft` CLI. Set `APHANTASIA_CLIP_PT` (or `clip_weights`) to a "
    "real OpenAI/HF CLIP checkpoint — without it imagery is random-weight "
    "noise (see docs/WEIGHTS.md).",
    """\
#@title Generation settings
text = "fluid mosaic of molten glass"  #@param {type:"string"}
style = ""              #@param {type:"string"}
subtract = ""           #@param {type:"string"}
size = "320-180"        #@param {type:"string"}  # use "1280-720" for real runs
steps = 8               #@param {type:"integer"} # 100..300 for real runs
samples = 8             #@param {type:"integer"} # 200 for real runs
use_dwt = False         #@param {type:"boolean"}
aest = 0.0              #@param {type:"number"}
sharp = 0.0             #@param {type:"number"}
clip_weights = None     # path to ViT-B/32 checkpoint (or set APHANTASIA_CLIP_PT)
out_dir = '_nb_out/aphantasia'
""",
    """\
from aphantasia_tpu.cli import clip_fft

argv = ['-t', text, '--size', size, '--steps', str(steps),
        '--samples', str(samples), '--out_dir', out_dir,
        '--aest', str(aest), '--sharp', str(sharp), '--transform', 'fast']
if style:
    argv += ['-t2', style]
if subtract:
    argv += ['-t0', subtract]
if use_dwt:
    argv += ['--dwt']
if clip_weights:
    argv += ['--clip_weights', clip_weights]
a = clip_fft.get_args(argv)
params = clip_fft.run(a)
""",
    PREVIEW)

ILLUSTRA = nb(
    "Illustra — per-line images + FFT crossfade video",
    "Renders one image per text line, then assembles a video that "
    "crossfades between them in FFT spectrum space. Equivalent of the "
    "reference Illustra.ipynb, driving the `illustra` CLI.",
    """\
#@title Scenes (one per line)
scenes = '''dawn over a sleeping city
the city wakes, markets fill with color
night returns with rivers of neon'''
size = "320-180"        #@param {type:"string"}
steps = 6               #@param {type:"integer"} # 150+ for real runs
samples = 8             #@param {type:"integer"}
lsteps = 4              #@param {type:"integer"} # crossfade frames per scene
keep = 1.5              #@param {type:"number"}  # imagery accumulation
out_dir = '_nb_out/illustra'

import os
os.makedirs(out_dir, exist_ok=True)
scene_file = os.path.join(out_dir, 'scenes.txt')
open(scene_file, 'w').write(scenes)
""",
    """\
from aphantasia_tpu.cli import illustra

a = illustra.get_args(['-t', scene_file, '--size', size,
                       '--steps', str(steps), '--samples', str(samples),
                       '--lsteps', str(lsteps), '--keep', str(keep),
                       '--out_dir', out_dir, '--transform', 'fast'])
illustra.run(a)
""",
    PREVIEW)

ILLUSTRIP = nb(
    "IllusTrip — text to video with 3D motion",
    "Continuous video: pan/zoom/rotate/shear motion applied to the "
    "parameter state between optimization steps, with optional "
    "Depth-Anything-V2 3D warp (`depth=1`, needs APHANTASIA_DAV2_PT). "
    "Equivalent of the reference IllusTrip3D.ipynb, driving `illustrip`.",
    """\
#@title Trip settings
text = "journey through a bioluminescent forest"  #@param {type:"string"}
size = "320-180"        #@param {type:"string"}
steps = 6               #@param {type:"integer"} # frames per scene; 200+ real
opt_step = 2            #@param {type:"integer"} # CLIP steps per frame
fstep = 2               #@param {type:"integer"}
samples = 8             #@param {type:"integer"}
gen = "FFT"             #@param ["FFT", "RGB"]
depth = 0.0             #@param {type:"number"}  # 1.0 enables the 3D warp
out_dir = '_nb_out/illustrip'
""",
    """\
from aphantasia_tpu.cli import illustrip

a = illustrip.get_args(['-t', text, '--size', size, '--steps', str(steps),
                        '--opt_step', str(opt_step), '--fstep', str(fstep),
                        '--samples', str(samples), '--gen', gen,
                        '--depth', str(depth), '--out_dir', out_dir,
                        '--transform', 'fast'])
illustrip.run(a)
""",
    PREVIEW)

VQGAN = nb(
    "CLIP + VQGAN — latent optimization",
    "Optimizes VQGAN latents decoded by a frozen taming-transformers "
    "decoder. Equivalent of the reference CLIP_VQGAN.ipynb, driving the "
    "`clip_vqgan` CLI. Set `APHANTASIA_VQGAN_PT` to a taming checkpoint "
    "for meaningful imagery.",
    """\
#@title VQGAN settings
text = "a coral reef made of stained glass"  #@param {type:"string"}
size = "128-128"        #@param {type:"string"}  # ~"800-600" max (README.md:129)
steps = 4               #@param {type:"integer"} # 100..500 real
samples = 6             #@param {type:"integer"}
model = "imagenet_f16_1024"  #@param ["imagenet_f16_1024", "imagenet_f16_16384", "gumbel_f8_8192"]
vqgan_weights = None    # path to taming .ckpt (or set APHANTASIA_VQGAN_PT)
out_dir = '_nb_out/vqgan'
""",
    """\
from aphantasia_tpu.cli import clip_vqgan

argv = ['-t', text, '--size', size, '--steps', str(steps),
        '--samples', str(samples), '--vqgan', model,
        '--out_dir', out_dir, '--transform', 'none']
if vqgan_weights:
    argv += ['--vqgan_weights', vqgan_weights]
a = clip_vqgan.get_args(argv)
clip_vqgan.run(a)
""",
    PREVIEW)


def main():
    for name, notebook in [("Aphantasia.ipynb", APHANTASIA),
                           ("Illustra.ipynb", ILLUSTRA),
                           ("IllusTrip.ipynb", ILLUSTRIP),
                           ("CLIP_VQGAN.ipynb", VQGAN)]:
        path = os.path.join(HERE, name)
        nbf.write(notebook, path)
        print("wrote", path)


if __name__ == "__main__":
    main()
