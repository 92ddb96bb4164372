"""Pallas TPU kernels: fused BN-apply -> ReLU -> 3x3/s2 max-pool.

The R(2+1)D stem (reference models/video.py:19-24) ends in
BatchNorm -> ReLU -> MaxPool3d((1,3,3), s(1,2,2), p(0,1,1)) — four HBM
round-trips over the (B*T,112,112,64) stem activation per step at the
flagship 224^2 shape under naive composition. These kernels fuse each
direction into ONE pass over the activation: forward reads y once and
writes the pooled output; backward reads (y, d_pooled) once, recomputes
the normalized activation in VMEM, routes the pool gradient to the first
row-major window max (exact XLA select-and-scatter semantics — see
_bwd_kernel), applies the ReLU mask and the BN linear coefficient, and
emits per-block partial sums for the BN parameter gradients.

STATUS / measured result (v5e-1, b32, (256,112,112,64) bf16,
profiler device times): the kernels are validated correct (fwd exact,
bwd ~1 bf16 ulp vs XLA) but LOSE to XLA's own fusions on this target —
fwd 8.0 ms vs 6.8 ms (XLA fuses BN+ReLU into reduce_window's producer),
bwd 43 ms vs ~9 ms (small H-tiles forced by the 16 MB VMEM limit with
f32 routing temps; 3.5k grid steps with 7 operand streams pipeline
poorly). The default path is therefore the XLA composition; set
AVID_STEM_POOL=pallas to opt the kernel in on targets where the balance
differs. Kept as validated infrastructure: the blocking/halo/exclusive-
routing machinery is the template for other windowed fusions.

Affine form: the op computes relu(y*a + b) with per-channel a, b
precomputed OUTSIDE (a = scale*rsqrt(var+eps), b = bias - mean*a), so
jax.grad chains through mean/var automatically — the custom VJP only
covers (y, a, b).

Blocking: one whole 112x112x64 frame (plus routing temps) overflows the
16 MB VMEM budget once Mosaic pads the 64-channel lane dim to 128, so
the grid tiles H; the one-or-two halo rows a pooling window needs across
a tile edge ride in as separate 1-row block operands (clamped index maps
+ in-kernel masking at the array edges, where the pool's zero padding is
exact because activations are post-ReLU).

Max-pool geometry is fixed to the stem's (3,3)/s2/p1 case; H and W must
be even (true for every reference recipe: 224 -> stem 112, 112 -> 56).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# -- shared in-kernel helpers -------------------------------------------------

def _relu_affine(y, a, b):
    """relu(y*a + b) computed in f32, returned in y's dtype (matches the
    flax BatchNorm float32-normalize-then-cast semantics)."""
    h = jnp.maximum(y.astype(jnp.float32) * a + b, 0.0)
    return h.astype(y.dtype)


def _shift_up(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """x[1:] followed by one zero row along `axis` (aligns index m+1 at m)."""
    z = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis))
    return jnp.concatenate([jax.lax.slice_in_dim(x, 1, None, axis=axis), z], axis)


def _shift_down(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """One zero row followed by x[:-1] (aligns index m-1 at m)."""
    z = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis))
    return jnp.concatenate([z, jax.lax.slice_in_dim(x, 0, -1, axis=axis)], axis)


def _pool_w(rows: jnp.ndarray) -> jnp.ndarray:
    """3/s2/p1 max over axis 1 (W): (R, W, C) -> (R, W/2, C)."""
    r, w, c = rows.shape
    sp = rows.reshape(r, w // 2, 2, c)
    we, wo = sp[:, :, 0], sp[:, :, 1]          # cols 2n / 2n+1
    return jnp.maximum(jnp.maximum(_shift_down(wo, 1), we), wo)


def _pool_rows(z: jnp.ndarray) -> jnp.ndarray:
    """3/s2 max over axis 0 of a (2*HO+2, ...) row stack where local row
    l corresponds to window rows 2o..2o+2: -> (HO, ...)."""
    n = z.shape[0]
    sp = z.reshape(n // 2, 2, *z.shape[1:])
    ze, zo = sp[:, 0], sp[:, 1]
    ho = n // 2 - 1
    return jnp.maximum(jnp.maximum(ze[:ho], zo[:ho]), ze[1 : ho + 1])


# -- forward ------------------------------------------------------------------

def _fwd_kernel(y_top_ref, y_ref, a_ref, b_ref, out_ref):
    j = pl.program_id(1)
    a = a_ref[0][0]
    b = b_ref[0][0]

    # zero the halo AFTER the affine at the image edge: the pool's
    # padding row is 0, not relu(0*a + b) = relu(b)
    yh_top = jnp.where(
        j == 0,
        jnp.zeros_like(y_top_ref[0]),
        _relu_affine(y_top_ref[0], a, b),
    )
    yh = _relu_affine(y_ref[0], a, b)

    # z row k corresponds to local input row k-1 (k=0 is the top halo);
    # out row o maxes z rows 2o..2o+2. One trailing zero row keeps the
    # even-reshape valid; it is never selected (2*(HB/2-1)+2 = HB).
    z = jnp.concatenate([yh_top, yh, jnp.zeros_like(yh[:1])], axis=0)
    out_ref[0] = _pool_w(_pool_rows(z)).astype(out_ref.dtype)


# -- backward -----------------------------------------------------------------

def _route_w_excl(v: jnp.ndarray, rm: jnp.ndarray, gr: jnp.ndarray):
    """W-axis exclusive routing: scatter each row's per-window gradient
    gr to the FIRST column (in window order 2n-1, 2n, 2n+1) achieving
    the row-window max rm. v: (R, W, C); rm, gr: (R, W/2, C) f32 ->
    (R, W, C) f32.

    All math runs in f32: bf16->f32 is exact so equality is unchanged,
    and Mosaic on v5e supports neither bf16 vector compare nor the bf16
    stack->reshape interleave (both fine at 32 bit)."""
    r, w, c = v.shape
    sp = v.reshape(r, w // 2, 2, c)
    ve = sp[:, :, 0].astype(jnp.float32)
    vo = sp[:, :, 1].astype(jnp.float32)
    vop = _shift_down(vo, 1)                      # col 2n-1 (first in win n)
    zero = jnp.zeros((), jnp.float32)
    # col 2n: second in window n — masked by col 2n-1
    d_e = jnp.where((ve == rm) & (vop != rm), gr, zero)
    # col 2n+1: first in window n+1, third in window n
    d_o = jnp.where(vo == _shift_up(rm, 1), _shift_up(gr, 1), zero)
    d_o = d_o + jnp.where(
        (vo == rm) & (vop != rm) & (ve != rm), gr, zero
    )
    return jnp.stack([d_e, d_o], axis=2).reshape(r, w, c)


def _bwd_kernel(
    y_top_ref, y_ref, y_bot_ref, a_ref, b_ref, g_ref, g_bot_ref,
    dy_ref, da_ref, db_ref,
):
    j = pl.program_id(1)
    n_h = pl.num_programs(1)
    a = a_ref[0][0]
    b = b_ref[0][0]
    g_bot = jnp.where(j == n_h - 1, jnp.zeros_like(g_bot_ref[0]), g_bot_ref[0])

    y = y_ref[0]
    # halos zeroed AFTER the affine at the image edges: the pool's
    # padding rows are 0, not relu(b)
    yh_top = jnp.where(
        j == 0,
        jnp.zeros_like(y_top_ref[0]),
        _relu_affine(y_top_ref[0], a, b),
    )
    yh = _relu_affine(y, a, b)
    yh_bot = jnp.where(
        j == n_h - 1,
        jnp.zeros_like(y_bot_ref[0]),
        _relu_affine(y_bot_ref[0], a, b),
    )

    # Routing reproduces XLA select-and-scatter exactly (gradient to the
    # FIRST row-major max in each 3x3 window — ties matter in bf16): the
    # separable decomposition routes to the first ROW whose W-row-max
    # equals the window max, then within it to the first matching column.
    # A halo tie at 0 can steal a mask only when the window max is 0, in
    # which case the routed gradient dies at the relu'(0)=0 factor anyway.
    #
    # z row k = local input row k-1; windows this block's rows belong to
    # are HO*j + o for o in 0..HB/2 (one past the block's own windows).
    # NB: positive indices only — negative jnp indexing lowers to
    # dynamic_slice, which Mosaic does not implement.
    z = jnp.concatenate([yh_top, yh, yh_bot], axis=0)      # (HB+3, W, C)
    nz = z.shape[0]
    hb = yh.shape[0]
    rmz = _pool_w(z).astype(jnp.float32)                   # (HB+3, W/2, C)
    out_all = _pool_rows(z[: nz - 1])                      # (HB/2, W, C) rows
    out_all = _pool_w(out_all).astype(jnp.float32)         # (HB/2, W/2, C)
    out_x = jnp.maximum(
        jnp.maximum(rmz[nz - 3], rmz[nz - 2]), rmz[nz - 1]
    )[None]                                                # window HB/2
    g = g_ref[0].astype(jnp.float32)                       # (HB/2, W/2, C)
    g_bot32 = g_bot.astype(jnp.float32)
    out_next = jnp.concatenate([out_all[1:], out_x], axis=0)
    g_next = jnp.concatenate([g[1:], g_bot32], axis=0)

    # H stage: window m rows in priority order are 2m-1, 2m, 2m+1 =
    # rmz[2m], rmz[2m+1], rmz[2m+2]
    pairs = rmz[: hb + 2].reshape(hb // 2 + 1, 2, *rmz.shape[1:])
    rm_prev = pairs[: hb // 2, 0]                          # row 2m-1
    rm_e = pairs[: hb // 2, 1]                             # row 2m
    rm_o = pairs[1:, 0]                                    # row 2m+1
    zero = jnp.zeros((), jnp.float32)
    grow_e = jnp.where((rm_e == out_all) & (rm_prev != out_all), g, zero)
    grow_o = jnp.where(rm_o == out_next, g_next, zero) + jnp.where(
        (rm_o == out_all) & (rm_prev != out_all) & (rm_e != out_all), g, zero
    )

    # W stage within each row
    pg = yh.reshape(hb // 2, 2, *yh.shape[1:])
    d_e = _route_w_excl(pg[:, 0], rm_e, grow_e)
    d_o = _route_w_excl(pg[:, 1], rm_o, grow_o)
    d_yh = jnp.stack([d_e, d_o], axis=1).reshape(yh.shape)  # f32

    d_pre = jnp.where(
        yh.astype(jnp.float32) > 0, d_yh, jnp.zeros((), jnp.float32)
    )
    dy_ref[0] = (d_pre * a).astype(dy_ref.dtype)
    da_ref[0, 0] = jnp.sum(d_pre * y.astype(jnp.float32), axis=(0, 1))
    db_ref[0, 0] = jnp.sum(d_pre, axis=(0, 1))


# -- host-side wrappers -------------------------------------------------------

def _pick_hb(h: int, max_hb: int = 28) -> int:
    """H-tile size: small enough that one (HB, W, C) tile plus temps
    fits VMEM at the stem's W<=112, C=64; 0 = unsupported H. The
    backward keeps routing temps in f32, so its tiles are half-size."""
    for hb in (28, 14, 8, 4, 2):
        if hb <= max_hb and h % hb == 0:
            return hb
    return 0


def _row_spec(w, c, rows, row_of):
    return pl.BlockSpec(
        (1, rows, w, c),
        lambda i, j: (i, row_of(j), 0, 0),
        memory_space=pltpu.VMEM,
    )


def _ab_spec(c):
    return pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0),
                        memory_space=pltpu.VMEM)


def _pallas_fwd(y4, a, b):
    n, h, w, c = y4.shape
    hb = _pick_hb(h)
    n_h = h // hb
    grid = (n, n_h)
    a2 = a.reshape(1, 1, c).astype(jnp.float32)
    b2 = b.reshape(1, 1, c).astype(jnp.float32)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            _row_spec(w, c, 1, lambda j: jnp.maximum(j * hb - 1, 0)),
            _row_spec(w, c, hb, lambda j: j),
            _ab_spec(c),
            _ab_spec(c),
        ],
        out_specs=pl.BlockSpec(
            (1, hb // 2, w // 2, c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), y4.dtype),
    )(y4, y4, a2, b2)


def _pallas_bwd(y4, a, b, g4):
    n, h, w, c = y4.shape
    hb = _pick_hb(h, max_hb=8)
    n_h = h // hb
    last_row = h - 2
    last_g = h // 2 - 1
    a2 = a.reshape(1, 1, c).astype(jnp.float32)
    b2 = b.reshape(1, 1, c).astype(jnp.float32)
    dy, da, db = pl.pallas_call(
        _bwd_kernel,
        grid=(n, n_h),
        in_specs=[
            _row_spec(w, c, 1, lambda j: jnp.maximum(j * hb - 1, 0)),
            _row_spec(w, c, hb, lambda j: j),
            _row_spec(w, c, 2,
                      lambda j: jnp.minimum((j + 1) * hb, last_row) // 2),
            _ab_spec(c),
            _ab_spec(c),
            pl.BlockSpec((1, hb // 2, w // 2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, w // 2, c),
                lambda i, j: (i, jnp.minimum((j + 1) * (hb // 2), last_g), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            _row_spec(w, c, hb, lambda j: j),
            pl.BlockSpec((1, 1, c), lambda i, j: (i * n_h + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i * n_h + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), y4.dtype),
            jax.ShapeDtypeStruct((n * n_h, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n * n_h, 1, c), jnp.float32),
        ],
    )(y4, y4, y4, a2, b2, g4, g4)
    return dy, jnp.sum(da[:, 0], axis=0), jnp.sum(db[:, 0], axis=0)


# -- public op ----------------------------------------------------------------

def _xla_scale_relu_pool(y, a, b):
    """Reference XLA composition (used on CPU/f32 and for validation)."""
    yh = jax.nn.relu(y * a.astype(y.dtype) + b.astype(y.dtype))
    # NB: init value must be a Python scalar — a traced/device array
    # defeats lax's max-monoid recognition and yields a generic (non-
    # differentiable) reduce_window.
    return jax.lax.reduce_window(
        yh,
        -float("inf"),
        jax.lax.max,
        window_dimensions=(1, 1, 3, 3, 1),
        window_strides=(1, 1, 2, 2, 1),
        padding=((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _use_pallas(y) -> bool:
    # AVID_STEM_POOL=pallas opts the TPU kernel in; default is the XLA
    # composition, which measured FASTER in-model on v5e (see module
    # docstring) — the kernel is kept as validated infrastructure for
    # targets where the balance differs.
    import os

    if os.environ.get("AVID_STEM_POOL", "xla") != "pallas":
        return False
    if jax.default_backend() != "tpu":
        # pltpu primitives; will not lower on GPU backends
        return False
    if y.dtype != jnp.bfloat16:
        # f32 temps overflow the VMEM budget; production TPU training is
        # bf16 — f32 runs take the XLA composition
        return False
    h, w = y.shape[-3], y.shape[-2]
    return h % 2 == 0 and w % 2 == 0 and _pick_hb(h) > 0


def _scale_relu_pool_impl(y, a, b):
    if not _use_pallas(y):
        return _xla_scale_relu_pool(y, a, b)
    bsz, t, h, w, c = y.shape
    out = _pallas_fwd(y.reshape(bsz * t, h, w, c), a, b)
    return out.reshape(bsz, t, h // 2, w // 2, c)


@jax.custom_vjp
def scale_relu_pool(y: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
    """relu(y * a + b) then 3x3/s2/p1 max-pool over (H, W).

    y: (B, T, H, W, C) with H, W even; a, b: (C,) float32.
    Returns (B, T, H/2, W/2, C) in y.dtype.
    """
    return _scale_relu_pool_impl(y, a, b)


def _srp_fwd(y, a, b):
    return _scale_relu_pool_impl(y, a, b), (y, a, b)


def _srp_bwd(res, g):
    y, a, b = res
    if not _use_pallas(y):
        _, vjp = jax.vjp(_xla_scale_relu_pool, y, a, b)
        return vjp(g)
    bsz, t, h, w, c = y.shape
    dy, da, db = _pallas_bwd(
        y.reshape(bsz * t, h, w, c), a, b,
        g.reshape(bsz * t, h // 2, w // 2, c),
    )
    return (
        dy.reshape(y.shape),
        da.astype(a.dtype),
        db.astype(b.dtype),
    )


scale_relu_pool.defvjp(_srp_fwd, _srp_bwd)
