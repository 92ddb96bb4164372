"""Model-layer tests: shapes of every tap at reference resolutions,
parameter counts vs the reference architectures, and jit-ability.

Reference tap shapes derived from models/video.py:44-54 and
models/audio.py:34-44 at the config resolutions
(configs/main/avid/kinetics/Cross-N1024.yaml: 8x224x224 video,
200x257 spectrograms).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avid_cma_tpu.models import Conv2D, R2Plus1D, av_wrapper


def _init(model, *args, **kwargs):
    variables = model.init(jax.random.key(0), *args, train=False, **kwargs)
    return variables


def test_r2plus1d_18_tap_shapes():
    model = R2Plus1D(depth=18)
    x = jnp.zeros((2, 8, 112, 112, 3))
    variables = _init(model, x)
    taps = model.apply(variables, x, train=False, return_embs=True)
    # stem: (1,2,2) conv + (1,2,2) maxpool -> 28x28 at 112 input
    assert taps["conv1"].shape == (2, 8, 28, 28, 64)
    assert taps["conv2x"].shape == (2, 8, 28, 28, 64)
    assert taps["conv3x"].shape == (2, 4, 14, 14, 128)
    assert taps["conv4x"].shape == (2, 2, 7, 7, 256)
    assert taps["conv5x"].shape == (2, 1, 4, 4, 512)
    assert taps["pool"].shape == (2, 512)


@pytest.mark.parametrize("depth,blocks", [(10, (1, 1, 1, 1)), (34, (3, 4, 6, 3))])
def test_r2plus1d_depths(depth, blocks):
    model = R2Plus1D(depth=depth)
    x = jnp.zeros((1, 4, 32, 32, 3))
    variables = _init(model, x)
    params = variables["params"]
    for stage_idx, n in enumerate(blocks):
        stage_keys = [k for k in params if k.startswith(f"conv{stage_idx+2}x_")]
        assert len(stage_keys) == n, (depth, stage_idx, stage_keys)


@pytest.mark.parametrize(
    "model,count",
    [
        (R2Plus1D(depth=18), 15_379_136),
        (R2Plus1D(depth=10), 7_015_616),
        (Conv2D(depth=10), 4_725_696),
    ],
)
def test_param_count_matches_reference(model, count):
    """Trainable parameter counts measured on the reference torch models
    (models/video.py R2Plus1D, models/audio.py Conv2D): convs without bias
    + BN affine pairs."""
    if isinstance(model, Conv2D):
        x = jnp.zeros((1, 64, 65, 1))
    else:
        x = jnp.zeros((1, 4, 32, 32, 3))
    variables = _init(model, x)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert n_params == count


def test_conv2d_tap_shapes():
    model = Conv2D(depth=10)
    x = jnp.zeros((2, 200, 257, 1))
    variables = _init(model, x)
    taps = model.apply(variables, x, train=False, return_embs=True)
    assert taps["conv2x"].shape == (2, 50, 65, 64)
    assert taps["conv3x"].shape == (2, 25, 33, 128)
    assert taps["conv4x"].shape == (2, 13, 17, 256)
    assert taps["conv5x"].shape == (2, 13, 17, 512)
    assert taps["pool"].shape == (2, 512)


def test_av_wrapper_embeddings():
    model = av_wrapper(
        video_backbone="R2Plus1D",
        video_backbone_args={"depth": 10},
        audio_backbone="Conv2D",
        audio_backbone_args={"depth": 10},
        proj_dim=[512, 512, 128],
    )
    video = jnp.zeros((2, 4, 64, 64, 3))
    audio = jnp.zeros((2, 100, 129, 1))
    variables = model.init(jax.random.key(0), video, audio, train=False)
    v_emb, a_emb = model.apply(variables, video, audio, train=False)
    assert v_emb.shape == (2, 128)
    assert a_emb.shape == (2, 128)


def test_batchnorm_updates_stats_in_train_mode():
    model = Conv2D(depth=10)
    x = jax.random.normal(jax.random.key(1), (4, 64, 65, 1))
    variables = _init(model, x)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = variables["batch_stats"]["bn1"]["mean"]
    new = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_model_jits():
    model = R2Plus1D(depth=10)
    x = jnp.zeros((1, 4, 32, 32, 3))
    variables = _init(model, x)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    out = fwd(variables, x)
    assert out.shape == (1, 512)
