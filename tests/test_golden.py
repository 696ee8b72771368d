"""Golden fixed-seed decode numerics — cheap fidelity-regression tripwire.

Pins 8 evenly-sampled pixels of each parameterizer's decode at
PRNGKey(42) (values recorded on CPU, jax 0.9.0).  A drift here means the
decode math changed — the thing the >=0.98 CLIP-cosine fidelity target
rests on (VERDICT r1 item 8).  Round 4 (VERDICT r3 item 8) widened the
original two tiny configs into a grid over the shapes users actually
run: FFT at 720p and a 4K-wide slice, DWT db2/coif2 at two sizes each,
pixel and CPPN samples (decode semantics: reference
aphantasia/image.py:122-177, 31-94, 98-119; cppn.py:71-116).
"""
import numpy as np
import jax
import pytest

from aphantasia_tpu.params.fft import FFTParameterizer
from aphantasia_tpu.params.dwt import DWTParameterizer
from aphantasia_tpu.params.pixel import PixelParameterizer
from aphantasia_tpu.params.cppn import CPPNParameterizer

GOLDEN_FFT = [0.402647, 0.545423, 0.605964, 0.408724,
              0.482968, 0.319059, 0.44099, 0.535997]
GOLDEN_DWT = [0.456579, 0.266184, 0.506325, 0.659648,
              0.549595, 0.45681, 0.513342, 0.390885]
GOLDEN_FFT_720P = [0.508593, 0.348388, 0.5045, 0.484139,
                   0.393413, 0.218221, 0.374533, 0.725051]
GOLDEN_FFT_4K_SLICE = [0.426429, 0.42822, 0.545312, 0.448835,
                       0.489557, 0.630888, 0.4225, 0.468509]
GOLDEN_DWT_DB2 = [0.580061, 0.609852, 0.480074, 0.613684,
                  0.363503, 0.455736, 0.511131, 0.3293]
GOLDEN_DWT_COIF2_96 = [0.538994, 0.615847, 0.457691, 0.754268,
                       0.403544, 0.37706, 0.484744, 0.722351]
GOLDEN_PIXEL = [0.50079, 0.480428, 0.576506, 0.773307,
                0.47794, 0.357049, 0.175365, 0.66454]
GOLDEN_CPPN = [0.792551, 0.071719, 0.289035, 0.127613,
               0.385523, 0.168461, 0.631537, 0.478299]


def _sample(img):
    img = np.asarray(img)
    idx = np.linspace(0, img.size - 1, 8).astype(int)
    return img.ravel()[idx]


def _check(par, golden, atol=2e-4):
    img = par.image(par.init(jax.random.PRNGKey(42)))
    np.testing.assert_allclose(_sample(img), golden, atol=atol)


def test_fft_decode_golden():
    _check(FFTParameterizer((64, 96), 1.5, 1.8), GOLDEN_FFT)


def test_fft_decode_golden_720p():
    """The headline canvas itself — the shape every perf claim runs at."""
    _check(FFTParameterizer((720, 1280), 1.5, 1.8), GOLDEN_FFT_720P)


@pytest.mark.slow
def test_fft_decode_golden_4k_slice():
    """4096-wide slice: exercises the 4K-width DFT factor matrices
    (~45 s of dense CPU DFT — slow tier)."""
    _check(FFTParameterizer((64, 4096), 1.5, 1.8), GOLDEN_FFT_4K_SLICE)


def test_dwt_decode_golden():
    _check(DWTParameterizer((32, 48), "coif2", 0.3, 1.8), GOLDEN_DWT)


def test_dwt_decode_golden_db2():
    _check(DWTParameterizer((64, 96), "db2", 0.3, 1.8), GOLDEN_DWT_DB2)


def test_dwt_decode_golden_coif2_tall():
    """Second size + H>W orientation (different maxlevel than 32x48)."""
    _check(DWTParameterizer((96, 64), "coif2", 0.3, 1.8), GOLDEN_DWT_COIF2_96)


def test_pixel_decode_golden():
    _check(PixelParameterizer((48, 64)), GOLDEN_PIXEL)


def test_cppn_decode_golden():
    _check(CPPNParameterizer((40, 56)), GOLDEN_CPPN)
