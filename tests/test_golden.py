"""Golden-image regression: tiny fixed-seed renders of the demo worlds,
compared bit-for-bit against committed references (the image-level suite
the reference lacks, SURVEY.md §4). Regenerate goldens ONLY for an
intentional semantic change:

    python -c "..."  # see tests/goldens/README
"""

from pathlib import Path

import numpy as np
import pytest

from crucible_tpu.models import demo, render

GOLDEN = Path(__file__).parent / "goldens" / "golden_v1.npz"

CONFIGS = {
    "smoke": (demo.smoke_scene, dict(width=32), 4, 6),
    "book1": (demo.book1_end_scene, dict(width=32), 2, 6),
    "checker": (demo.checkered_spheres, dict(width=32), 2, 4),
    "earth": (demo.earth, dict(width=32), 2, 4),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name):
    fn, kw, spp, depth = CONFIGS[name]
    sc = fn(**kw)
    img = render.render_image(sc, samples=spp, max_depth=depth, seed=0, mode="tiled")
    want = np.load(GOLDEN)[name]
    # Same platform + deterministic RNG: tolerance only for cross-platform
    # f32 contraction-order differences.
    np.testing.assert_allclose(np.asarray(img), want, atol=2e-5)
