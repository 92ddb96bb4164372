"""Device-side augmentation invariants (ops/video_aug.py).

The end-to-end path is exercised by test_data.py::test_preprocess_batch_shapes
and the loop tests; these pin the jitter math properties that full-pipeline
shape tests can't see.
"""

import jax
import jax.numpy as jnp
import numpy as np

from avid_cma_tpu.ops.video_aug import color_jitter_clip


def test_contrast_blend_is_per_frame():
    """torchvision adjust_contrast blends each frame toward its OWN gray
    mean — uniform frames are fixed points. A whole-clip mean would shift
    both frames of a bright/dark pair toward each other."""
    clip = jnp.stack([
        jnp.full((8, 8, 3), 0.2, jnp.float32),
        jnp.full((8, 8, 3), 0.8, jnp.float32),
    ])
    out = color_jitter_clip(
        jax.random.key(0), clip, brightness=0.0, contrast=0.4,
        saturation=0.0, hue=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(clip), atol=1e-5)


def test_jitter_preserves_dtype():
    """bf16 clips must stay bf16 through the jitter chain (jax.random
    factors are strong f32; unchecked promotion doubles HBM traffic)."""
    clip = jnp.ones((4, 8, 8, 3), jnp.bfloat16) * 0.5
    out = color_jitter_clip(
        jax.random.key(1), clip, brightness=0.4, contrast=0.4,
        saturation=0.4, hue=0.2,
    )
    assert out.dtype == jnp.bfloat16
