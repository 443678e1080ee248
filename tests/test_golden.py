"""Golden-checksum tests (SURVEY.md §4 item b): sha256 of every oracle op's
output on a fixed crop of the real benchmark image, committed here. Any
unintended change to the consensus op semantics — rounding, borders,
weights — breaks these. The crop sits in the image interior plus its
synthetic borders via the op's own mirror handling.
"""

import hashlib
import os

import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.utils.testimage import ref_path

FUNDUS = ref_path("assets/fundus.jpg")

# sha256[:16] of op(crop).tobytes(); crop = fundus[1000:1128, 1500:1756] RGB.
GOLDEN = {
    "Convolution-1x3+3x1": "cde6e036d921a525",
    "Convolution-1x5+5x1": "6b85de1c7992b12c",
    "Convolution-3x3": "9a16d92ee3ae91d1",
    "Convolution-5x5": "78db87be2035a6cb",
    "Copy": "efbd33c10d9958f4",
    "Erosion-1x3+3x1-Square": "0cd2df8ba80eca70",
    "Erosion-3x3-Cross": "5632873b4b1ee462",
    "Erosion-3x3-Square": "0cd2df8ba80eca70",
    "Fused-Pipeline": "3a3ed164e42500a1",
    "Gaussian-Blur-3x3": "9a16d92ee3ae91d1",
    "Grayscale": "4556bf2141acc39a",
    "Inversion": "ba75a0ce02f04f78",
    "Threshold": "dfb3b088a2988f15",
}
INPUT_HASH = "efbd33c10d9958f4"

@pytest.fixture(scope="module")
def crop() -> np.ndarray:
    if not os.path.exists(FUNDUS):
        pytest.skip("reference fundus.jpg not mounted")
    from dip_benchmark_tpu.utils.image import load_image
    img = load_image(FUNDUS)[1000:1128, 1500:1756]
    assert hashlib.sha256(img.tobytes()).hexdigest()[:16] == INPUT_HASH, (
        "fundus.jpg decode changed — golden hashes need regeneration")
    return img


@pytest.mark.parametrize("col", sorted(GOLDEN))
def test_oracle_golden(col, crop):
    h = hashlib.sha256(oracle.IMAGE_OPS[col](crop).tobytes()).hexdigest()[:16]
    assert h == GOLDEN[col], f"{col}: semantics drifted from golden"


# Second real image: assets/emphysema.jpg (528x393), shipped by the
# reference but referenced nowhere in its code (SURVEY.md §0) — used here
# as an independent full-image golden fixture (no crop: full mirror borders).
EMPHYSEMA = ref_path("assets/emphysema.jpg")
EMPHYSEMA_INPUT_HASH = "f86465ffb905421b"
EMPHYSEMA_GOLDEN = {
    "Convolution-1x3+3x1": "37b65e0f24df40bc",
    "Convolution-1x5+5x1": "700893bd8e8568ba",
    "Convolution-3x3": "68a113cded79d711",
    "Convolution-5x5": "379739a6045023f0",
    "Copy": "f86465ffb905421b",
    "Erosion-1x3+3x1-Square": "2ccfaf8579f1b2a2",
    "Erosion-3x3-Cross": "738e3d2652fc1d9d",
    "Erosion-3x3-Square": "2ccfaf8579f1b2a2",
    "Fused-Pipeline": "0ccaf6bc326931f5",
    "Gaussian-Blur-3x3": "68a113cded79d711",
    "Grayscale": "d6d1dda34194b2cc",  # integer fixed-point luma (spec r2)
    "Inversion": "7ca9caf2eb103790",
    "Threshold": "6baea30ead2ac1b0",
}


@pytest.fixture(scope="module")
def emphysema() -> np.ndarray:
    if not os.path.exists(EMPHYSEMA):
        pytest.skip("reference emphysema.jpg not mounted")
    from dip_benchmark_tpu.utils.image import load_image
    img = load_image(EMPHYSEMA)
    assert (hashlib.sha256(img.tobytes()).hexdigest()[:16]
            == EMPHYSEMA_INPUT_HASH), (
        "emphysema.jpg decode changed — golden hashes need regeneration")
    return img


@pytest.mark.parametrize("col", sorted(EMPHYSEMA_GOLDEN))
def test_oracle_golden_emphysema(col, emphysema):
    h = hashlib.sha256(
        oracle.IMAGE_OPS[col](emphysema).tobytes()).hexdigest()[:16]
    assert h == EMPHYSEMA_GOLDEN[col], f"{col}: semantics drifted"


@pytest.mark.parametrize("col", ["Erosion-3x3-Square", "Convolution-5x5",
                                 "Fused-Pipeline"])
def test_pallas_golden_emphysema(col, emphysema):
    """Both execution paths reproduce the goldens on the second image."""
    import jax
    from dip_benchmark_tpu.ops import pallas, xla
    from dip_benchmark_tpu.utils.image import make_layout, to_planar_padded
    layout = make_layout(*emphysema.shape[:2])
    planar = jax.device_put(to_planar_padded(emphysema, layout))
    out = pallas.build_crops(layout)[col](
        pallas.build_ops(layout)[col](planar))
    assert (hashlib.sha256(out.tobytes()).hexdigest()[:16]
            == EMPHYSEMA_GOLDEN[col])
    out_x = np.asarray(jax.jit(xla.IMAGE_OPS[col])(emphysema))
    assert (hashlib.sha256(out_x.tobytes()).hexdigest()[:16]
            == EMPHYSEMA_GOLDEN[col])


# Third fixture: the SELF-CONTAINED synthetic fundus
# (utils/testimage.synth_fundus at 528x393) — pure integer arithmetic, so
# unlike the two JPEG fixtures above these goldens never need a mount or
# a decode-stability guard: the full golden contract runs from this tree
# alone (round-4 VERDICT item 2; the reference's own-assets contract is
# /root/reference/README.md:5-9).
SYNTH_INPUT_HASH = "ab8ebf56b6dd9c7a"
SYNTH_GOLDEN = {
    "Convolution-1x3+3x1": "a061679cc78f7253",
    "Convolution-1x5+5x1": "e33f65af50a5e48c",
    "Convolution-3x3": "b3ad0f452a87ecd6",
    "Convolution-5x5": "36bbff7e2cbce578",
    "Copy": "ab8ebf56b6dd9c7a",
    "Erosion-1x3+3x1-Square": "d0092879988356d8",
    "Erosion-3x3-Cross": "a1c0c525e5e36914",
    "Erosion-3x3-Square": "d0092879988356d8",
    "Fused-Pipeline": "ae36553765b61774",
    "Gaussian-Blur-3x3": "b3ad0f452a87ecd6",
    "Grayscale": "1200f8d11af93dcf",
    "Inversion": "ffa2628dddec9c2d",
    "Threshold": "5bc1babc01430190",
}


@pytest.fixture(scope="module")
def synth() -> np.ndarray:
    from dip_benchmark_tpu.utils.testimage import synth_fundus
    img = synth_fundus(393, 528)
    assert (hashlib.sha256(img.tobytes()).hexdigest()[:16]
            == SYNTH_INPUT_HASH), "synth_fundus generator changed"
    return img


@pytest.mark.parametrize("col", sorted(SYNTH_GOLDEN))
def test_oracle_golden_synth(col, synth):
    h = hashlib.sha256(oracle.IMAGE_OPS[col](synth).tobytes()).hexdigest()[:16]
    assert h == SYNTH_GOLDEN[col], f"{col}: semantics drifted from golden"


@pytest.mark.parametrize("col", ["Erosion-3x3-Square", "Convolution-5x5",
                                 "Fused-Pipeline"])
def test_pallas_golden_synth(col, synth):
    """Both execution paths reproduce the self-contained goldens."""
    import jax
    from dip_benchmark_tpu.ops import pallas, xla
    from dip_benchmark_tpu.utils.image import make_layout, to_planar_padded
    layout = make_layout(*synth.shape[:2])
    planar = jax.device_put(to_planar_padded(synth, layout))
    out = pallas.build_crops(layout)[col](
        pallas.build_ops(layout)[col](planar))
    assert (hashlib.sha256(out.tobytes()).hexdigest()[:16]
            == SYNTH_GOLDEN[col])
    out_x = np.asarray(jax.jit(xla.IMAGE_OPS[col])(synth))
    assert (hashlib.sha256(out_x.tobytes()).hexdigest()[:16]
            == SYNTH_GOLDEN[col])
