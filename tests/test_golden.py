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

FUNDUS = "/root/reference/assets/fundus.jpg"

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

pytestmark = pytest.mark.skipif(not os.path.exists(FUNDUS),
                                reason="reference fundus.jpg not mounted")


@pytest.fixture(scope="module")
def crop() -> np.ndarray:
    from dip_benchmark_tpu.utils.image import load_image
    img = load_image(FUNDUS)[1000:1128, 1500:1756]
    assert hashlib.sha256(img.tobytes()).hexdigest()[:16] == INPUT_HASH, (
        "fundus.jpg decode changed — golden hashes need regeneration")
    return img


@pytest.mark.parametrize("col", sorted(GOLDEN))
def test_oracle_golden(col, crop):
    h = hashlib.sha256(oracle.IMAGE_OPS[col](crop).tobytes()).hexdigest()[:16]
    assert h == GOLDEN[col], f"{col}: semantics drifted from golden"
