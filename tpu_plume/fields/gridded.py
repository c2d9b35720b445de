"""Gridded plume fields: an HBM-resident bank of mean-concentration grids.

The WRF-LES-flavored path (BASELINE.json north star): instead of evaluating
the plume analytically, each episode samples a row of a ``FieldBank`` —
``conc: f32[K, H, W]`` grids living in HBM — and the env reads the grid at
the agent's cell.  Banks come from

  - ``ingest_netcdf``: real WRF-LES / CFD output (any NetCDF/HDF5 file with a
    [K, H, W] or [H, W] concentration variable + source coordinates), loaded
    once to device memory;
  - ``synthesize_bank``: procedurally generated anisotropic-dispersion grids
    (for experimentation without data, and for tests).

Procedural turbulence stays analytic (tpu_plume.core.prng), so banks only
need the mean field — K=1024 grids of 500x500 f32 are 1 GB of HBM, and cell
lookups are one XLA gather per step across all envs.  For sub-cell accuracy
(float positions, big grids) see tpu_plume.ops.gather for the bilinear
samplers (XLA gather and MXU one-hot-matmul variants).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpu_plume.core.config import EnvConfig


@struct.dataclass
class FieldBank:
    """A bank of K plume fields resident in HBM.

    ``conc`` layouts (all f32):
      [K, H, W]          static 2-D fields;
      [K, T, H, W]       time-varying 2-D fields, linearly interpolated over
                         the frame axis at ``steps_per_frame`` env steps/frame;
      [K, T, Z, H, W]    time-varying 3-D WRF-LES-style volumes — the z axis
                         spans ``z_extent`` grid units and is linearly
                         interpolated between levels (the north-star
                         (x, y, z, t) field query, BASELINE.json).

    ``wind`` is an optional per-frame horizontal wind vector bank —
    f32[K, 2] (static) or f32[K, T, 2] (per frame, time-interpolated) — the
    WRF-LES wind field the reference advertised but never ingested
    (reference README.md:6-7, 50; SURVEY.md §0)."""

    conc: jnp.ndarray            # f32[K,H,W] | f32[K,T,H,W] | f32[K,T,Z,H,W]
    source: jnp.ndarray          # f32[K, 2] source position per grid
    wind: jnp.ndarray | None = None   # f32[K, 2] | f32[K, T, 2] | None
    steps_per_frame: float = struct.field(pytree_node=False, default=1.0)
    z_extent: float = struct.field(pytree_node=False, default=0.0)
    # Optional packed layout built by ``pack_time_levels``: interpolation
    # NEIGHBORS of every cell stored as trailing vector components,
    # clamp-padded at the packed edges.  Base level packs (t, z) —
    # [K,T,Z,H,W,4] for 5-D, [K,T,H,W,2] for 4-D — so exact multilinear
    # sampling needs FOUR xy-corner gathers instead of 16; ``pack_xy``
    # levels additionally pack the +y and +x neighbors (trailing 8 / 16
    # components), down to ONE gather per query at 16x bank HBM.
    # Measured on v5e at 4096 queries over [4,8,8,500,500], sample-only:
    # corner 2.5M / tz-pack 5.0M / +y 6.1M / +y+x 6.87M samples/s —
    # gather COUNT, not bytes, is the cost driver.
    conc_packed: jnp.ndarray | None = None


def _frame_weights(bank: FieldBank, t, like) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(t0, ft): lower frame index + fractional weight for env step ``t``."""
    num_frames = bank.conc.shape[1]
    tf = (jnp.zeros_like(like, jnp.float32) if t is None
          else t.astype(jnp.float32)) / bank.steps_per_frame
    t0 = jnp.clip(jnp.floor(tf).astype(jnp.int32), 0, num_frames - 2)
    ft = jnp.clip(tf - t0.astype(jnp.float32), 0.0, 1.0)
    return t0, ft


def _level_weights(bank: FieldBank, z, like) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(z0, fz): lower z-level index + fractional weight for height ``z``
    (grid units in [0, z_extent])."""
    num_levels = bank.conc.shape[2]
    if num_levels == 1:
        zeros = jnp.zeros_like(like, jnp.int32)
        return zeros, jnp.zeros_like(like, jnp.float32)
    scale = (num_levels - 1) / max(bank.z_extent, 1e-9)
    zf = (jnp.zeros_like(like, jnp.float32) if z is None
          else z.astype(jnp.float32)) * scale
    z0 = jnp.clip(jnp.floor(zf).astype(jnp.int32), 0, num_levels - 2)
    fz = jnp.clip(zf - z0.astype(jnp.float32), 0.0, 1.0)
    return z0, fz


def sample_bank(bank: FieldBank, idx, ix, iy, t=None, z=None) -> jnp.ndarray:
    """Integer-cell lookup with linear time interpolation (4-D banks) and
    linear time+height interpolation (5-D banks).  Broadcasts.

    The corner reads are scattered fancy-index gathers on purpose: a
    patch-fetch via vmapped ``dynamic_slice`` (one sliced gather per query)
    measured 7x SLOWER end-to-end on a v5e (0.20M vs 1.38M env-steps/s at
    4096 envs) — XLA's scalar-result gather batches across the env axis far
    better than its sliced form."""
    if bank.conc.ndim == 3:
        return bank.conc[idx, ix, iy]
    t0, ft = _frame_weights(bank, t, jnp.asarray(ix))
    if bank.conc.ndim == 4:
        a = bank.conc[idx, t0, ix, iy]
        b = bank.conc[idx, t0 + 1, ix, iy]
        return (1.0 - ft) * a + ft * b
    z0, fz = _level_weights(bank, z, jnp.asarray(ix))
    z1 = jnp.minimum(z0 + 1, bank.conc.shape[2] - 1)

    def at(ti, zi):
        return bank.conc[idx, ti, zi, ix, iy]

    lo = (1.0 - fz) * at(t0, z0) + fz * at(t0, z1)
    hi = (1.0 - fz) * at(t0 + 1, z0) + fz * at(t0 + 1, z1)
    return (1.0 - ft) * lo + ft * hi


def _append_neighbor(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Double the trailing component axis with each cell's clamp-padded
    +1 neighbor along ``axis``: out[..., C:] = v[..., shifted, ..., :C]."""
    pad = jnp.concatenate([v, jax.lax.slice_in_dim(v, v.shape[axis] - 1,
                                                   v.shape[axis], axis=axis)],
                          axis=axis)
    shifted = jax.lax.slice_in_dim(pad, 1, v.shape[axis] + 1, axis=axis)
    return jnp.concatenate([v, shifted], axis=-1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _pack_impl(conc: jnp.ndarray, ndim: int, pack_xy: int) -> jnp.ndarray:
    if ndim == 5:
        vt = jnp.concatenate([conc, conc[:, -1:]], axis=1)
        vz = jnp.concatenate([vt, vt[:, :, -1:]], axis=2)
        t_dim, z_dim = conc.shape[1], conc.shape[2]
        packed = jnp.stack(
            [vz[:, dt:dt + t_dim, dz:dz + z_dim]
             for dt in (0, 1) for dz in (0, 1)], axis=-1)
    elif ndim == 4:
        vt = jnp.concatenate([conc, conc[:, -1:]], axis=1)
        t_dim = conc.shape[1]
        packed = jnp.stack([vt[:, dt:dt + t_dim] for dt in (0, 1)], axis=-1)
    else:
        packed = conc[..., None]
    if pack_xy >= 1:
        packed = _append_neighbor(packed, packed.ndim - 2)   # y axis
    if pack_xy >= 2:
        packed = _append_neighbor(packed, packed.ndim - 3)   # x axis
    return packed


def pack_time_levels(bank: FieldBank, pack_xy: int = 0) -> FieldBank:
    """Build the packed neighbor layout (see ``FieldBank.conc_packed``).

    ``pack_xy=0``: 5-D [K,T,Z,H,W] -> packed [K,T,Z,H,W,4] with components
    (t0z0, t0z1, t1z0, t1z1), clamp-padded at the t/z edges (reproducing
    the corner sampler's ``z1 = min(z0+1, Z-1)`` / ``t0 <= T-2`` semantics);
    4-D -> [K,T,H,W,2] with (t0, t1); 3-D banks have no (t, z) axes —
    returned unchanged.

    ``pack_xy=1`` additionally packs each cell's +y neighbor components
    (halves the xy-corner gathers to 2 at 2x more memory); ``pack_xy=2``
    packs the +x neighbor too, so the ENTIRE multilinear sample is ONE
    gather of a 16-component vector (5-D) at 16x bank memory — the
    fastest formulation measured on v5e (6.87M vs 4.99M sample-only,
    gather count being the cost driver).  3-D banks accept pack_xy >= 1
    (trailing 2 / 4 components).

    The pack runs under jit so XLA fuses it to one input + one output
    buffer: built eagerly, the concat/slice/stack chain materializes
    every intermediate (a [16,8,8,500,500] bank peaked >10 GB transient
    and OOM'd a 16 GB v5e; jitted it fits with room to train)."""
    if bank.conc.ndim == 3 and pack_xy == 0:
        return bank
    return bank.replace(
        conc_packed=_pack_impl(bank.conc, bank.conc.ndim, pack_xy))


def maybe_pack(bank: FieldBank, cfg: EnvConfig) -> FieldBank:
    """Apply ``pack_time_levels`` when the config wants sub-cell sampling,
    at the DEEPEST pack level whose copy fits the HBM budget: fewer
    gathers always win on v5e (gather count is the cost driver), so auto
    mode trades bank memory for gather count greedily.

    6 GB packed-copy budget: a v5e has 16 GB HBM and the training state
    is <1 GB.  A [4,8,8,500,500] bank full-packs (pack_xy=2, one gather
    per query) to 4.1 GB; a [16,...] bank falls back to the (t, z)-only
    pack at 4.1 GB (3.2M env-steps/s vs 1.35M corner-path); banks too
    big for any packed copy keep the 16-gather corner path.  Explicit
    ``bank_gather_mode="packed"`` forces the (t, z) pack regardless of
    budget."""
    if not cfg.subcell_sampling:
        return bank
    if cfg.bank_gather_mode not in ("auto", "packed"):
        return bank
    if cfg.bank_gather_mode == "packed":
        if bank.conc.ndim == 3:
            return bank
        return pack_time_levels(bank)
    base = {5: 4, 4: 2, 3: 1}[bank.conc.ndim]
    for pack_xy in (2, 1, 0):
        factor = base * (2 ** pack_xy)
        if factor == 1:          # 3-D bank with nothing packed
            return bank
        if bank.conc.size * 4 * factor <= 6e9:
            return pack_time_levels(bank, pack_xy)
    return bank


def sample_bank_points(
    bank: FieldBank, idx, x, y, t=None, z=None, *, gather_mode: str = "auto"
) -> jnp.ndarray:
    """Sub-cell multilinear sample at float points: bilinear in (x, y),
    linear in z (5-D banks) and in t (4/5-D banks) — the per-UAV
    (x, y, z, t) field query of the north star.  Broadcasts over leading
    axes.

    ``gather_mode`` (all parity-tested against each other):
      - "auto" (default): "packed" when the bank carries the
        ``pack_time_levels`` layout, else "corner";
      - "packed": FOUR gathers of (t, z)-component vectors — the fastest
        exact formulation measured on v5e (5.3M vs 2.5M samples/s
        sample-only; full-step numbers in RESULTS.md round 3);
      - "corner": one scattered gather per corner (2/4/8/16);
      - "fused": ONE flat-index gather for every corner of the batch —
        measured 2x SLOWER than corner (0.84M vs 1.5M env-steps/s full
        step): XLA runs independent small gathers faster than a single
        16x-index gather.  Kept for parity testing and other backends."""
    h, w = bank.conc.shape[-2], bank.conc.shape[-1]
    x = jnp.clip(jnp.asarray(x, jnp.float32), 0.0, h - 1.0)
    y = jnp.clip(jnp.asarray(y, jnp.float32), 0.0, w - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, h - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, w - 2)
    fx = x - x0
    fy = y - y0

    if gather_mode == "auto":
        gather_mode = "packed" if bank.conc_packed is not None else "corner"
    if gather_mode == "packed":
        if bank.conc_packed is None and bank.conc.ndim >= 4:
            raise ValueError(
                'gather_mode="packed" needs pack_time_levels(bank) first'
            )
        return _sample_points_packed(bank, idx, x0, y0, fx, fy, t, z)
    if gather_mode == "fused":
        return _sample_points_fused(bank, idx, x0, y0, fx, fy, t, z)

    def plane(ix, iy):
        return sample_bank(bank, idx, ix, iy, t, z)

    v00 = plane(x0, y0)
    v01 = plane(x0, y0 + 1)
    v10 = plane(x0 + 1, y0)
    v11 = plane(x0 + 1, y0 + 1)
    return (v00 * (1 - fx) * (1 - fy) + v01 * (1 - fx) * fy
            + v10 * fx * (1 - fy) + v11 * fx * fy)


@jax.custom_batching.custom_vmap
def _gather_components(packed, idx):
    """packed[(*idx,)] with a custom vmap rule.

    vmap of the scalar-query form rewrites the indexing to a
    dynamic-slice whose batching rule XLA lowers with a minormost
    component axis — the T(8, 128) tiled layout then pads 4 -> 128 and a
    relayout copy of the whole bank explodes HBM (measured: a 1 GB packed
    bank demanded a 33 GB copy).  The rule below re-traces the SAME
    expression with the whole index batch as vector advanced indexing —
    one ordinary gather, the formulation the microbenchmark measured at
    5.3M samples/s."""
    return packed[tuple(idx)]


@_gather_components.def_vmap
def _gather_components_vmap(axis_size, in_batched, packed, idx):
    del axis_size
    packed_batched, _ = in_batched
    assert not packed_batched, "field bank must be un-vmapped"
    return packed[tuple(idx)], True


def _sample_points_packed(bank: FieldBank, idx, x0, y0, fx, fy, t, z):
    """Gathers over the ``pack_time_levels`` layout; the interpolation
    over every packed axis is a dot with per-query component weights.
    4 / 2 / 1 xy-corner gathers depending on the layout's ``pack_xy``
    depth (read off the trailing component count)."""
    packed = bank.conc_packed
    idx = jnp.asarray(idx)
    nd = bank.conc.ndim
    if nd == 5:
        t0, ft = _frame_weights(bank, t, jnp.asarray(x0))
        z0, fz = _level_weights(bank, z, jnp.asarray(x0))
        lead = (idx, t0, z0)
        wts = jnp.stack(
            [(1 - ft) * (1 - fz), (1 - ft) * fz, ft * (1 - fz), ft * fz],
            axis=-1,
        )
        base_c = 4
    elif nd == 4:
        t0, ft = _frame_weights(bank, t, jnp.asarray(x0))
        lead = (idx, t0)
        wts = jnp.stack([1 - ft, ft], axis=-1)
        base_c = 2
    else:
        lead = (idx,)
        wts = jnp.ones(jnp.shape(jnp.asarray(x0)) + (1,), jnp.float32)
        base_c = 1

    if packed is None:           # unpacked 3-D bank: plain corner reads

        def at(ix, iy):
            return bank.conc[idx, ix, iy]

        y_packed = x_packed = False
    else:
        c = packed.shape[-1]
        y_packed = c >= base_c * 2
        x_packed = c == base_c * 4
        # Progressive weight vector mirroring _pack_impl's component order.
        if y_packed:
            wts = jnp.concatenate(
                [wts * (1 - fy)[..., None], wts * fy[..., None]], axis=-1)
        if x_packed:
            wts = jnp.concatenate(
                [wts * (1 - fx)[..., None], wts * fx[..., None]], axis=-1)

        def at(ix, iy):
            comp = _gather_components(packed, lead + (ix, iy))
            return jnp.sum(comp * wts, axis=-1)

    if x_packed:                 # ONE gather: all corners are components
        return at(x0, y0)
    if y_packed:                 # two x-corner gathers
        return (1 - fx) * at(x0, y0) + fx * at(x0 + 1, y0)
    v00 = at(x0, y0)
    v01 = at(x0, y0 + 1)
    v10 = at(x0 + 1, y0)
    v11 = at(x0 + 1, y0 + 1)
    return (v00 * (1 - fx) * (1 - fy) + v01 * (1 - fx) * fy
            + v10 * fx * (1 - fy) + v11 * fx * fy)


def _sample_points_fused(bank: FieldBank, idx, x0, y0, fx, fy, t, z):
    """All multilinear corners of every query in ONE flat gather.

    Builds the [C, ...] corner index/weight tensors (C = 4 x 2^time x
    2^height), linearizes into the raveled bank, gathers once, and
    contracts with the weights.  Equivalent to the per-corner formulation
    bit-for-bit up to float addition order."""
    conc = bank.conc
    h, w = conc.shape[-2], conc.shape[-1]
    idx = jnp.asarray(idx)

    # (axis offset, axis weight) pairs, innermost last; each [2, ...]
    def pair(frac):
        return jnp.stack([1.0 - frac, frac])

    corner_off = [jnp.stack([jnp.zeros_like(x0), jnp.ones_like(x0)]) * w,
                  jnp.stack([jnp.zeros_like(y0), jnp.ones_like(y0)])]
    corner_wt = [pair(fx), pair(fy)]
    base = x0 * w + y0
    stride = h * w

    if conc.ndim >= 4:
        t0, ft = _frame_weights(bank, t, jnp.asarray(x0))
        if conc.ndim == 5:
            zdim = conc.shape[2]
            z0, fz = _level_weights(bank, z, jnp.asarray(x0))
            z1 = jnp.minimum(z0 + 1, zdim - 1)
            corner_off.insert(0, jnp.stack([z0, z1]) * stride)
            corner_wt.insert(0, pair(fz))
            stride = stride * zdim
        corner_off.insert(0, jnp.stack([t0, t0 + 1]) * stride)
        corner_wt.insert(0, pair(ft))
        stride = stride * conc.shape[1]
    base = base + idx * stride

    flat_idx = base[None]
    weights = jnp.ones_like(jnp.asarray(fx))[None]
    for off, wt in zip(corner_off, corner_wt):
        flat_idx = (flat_idx[None] + off[:, None]).reshape(-1, *base.shape)
        weights = (weights[None] * wt[:, None]).reshape(-1, *base.shape)
    vals = conc.reshape(-1)[flat_idx]          # ONE gather of [C, ...]
    return jnp.sum(vals * weights, axis=0)


def bank_wind(bank: FieldBank, idx, t=None) -> jnp.ndarray:
    """Per-episode horizontal wind vector, time-interpolated for per-frame
    wind banks.  Returns f32[..., 2]; zeros when the bank carries no wind."""
    if bank.wind is None:
        base = jnp.zeros(jnp.shape(idx) + (2,), jnp.float32)
        return base
    if bank.wind.ndim == 2:
        return bank.wind[idx]
    num_frames = bank.wind.shape[1]
    like = jnp.asarray(idx)
    tf = (jnp.zeros_like(like, jnp.float32) if t is None
          else t.astype(jnp.float32)) / bank.steps_per_frame
    t0 = jnp.clip(jnp.floor(tf).astype(jnp.int32), 0, max(num_frames - 2, 0))
    ft = jnp.clip(tf - t0.astype(jnp.float32), 0.0, 1.0)
    a = bank.wind[idx, t0]
    b = bank.wind[idx, jnp.minimum(t0 + 1, num_frames - 1)]
    return (1.0 - ft[..., None]) * a + ft[..., None] * b


def synthesize_bank(
    key: jax.Array, cfg: EnvConfig, num_fields: int = 64
) -> FieldBank:
    """Generate an anisotropic-dispersion bank (sigma_y = 0.3 x^0.71 plumes
    with random winds) on device."""
    from tpu_plume.fields.analytic import FieldState, _anisotropic_base

    g = cfg.grid_size
    k_src, k_wind = jax.random.split(key)
    lo, hi = cfg.source_padding, g - cfg.source_padding
    sources = jax.random.uniform(k_src, (num_fields, 2), jnp.float32, lo, hi)
    theta = jax.random.uniform(k_wind, (num_fields,), jnp.float32, 0, 2 * jnp.pi)
    winds = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)

    ix = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).astype(jnp.float32)

    def one(source, wind):
        fs = FieldState(
            source=source,
            seed=jnp.uint32(0),
            wind=wind,
            idx=jnp.int32(0),
        )
        return _anisotropic_base(fs, ix, iy, cfg)

    conc = jax.vmap(one)(sources, winds)
    return FieldBank(conc=conc, source=sources)


def synthesize_time_varying_bank(
    key: jax.Array,
    cfg: EnvConfig,
    num_fields: int = 8,
    num_frames: int = 16,
    steps_per_frame: float = 64.0,
    grid: int | None = None,
) -> FieldBank:
    """Time-varying anisotropic plumes: the wind direction veers across
    frames, sweeping the downwind ribbon — a synthetic stand-in for a
    time-resolved WRF-LES volume."""
    from tpu_plume.fields.analytic import FieldState, _anisotropic_base

    g = grid or cfg.grid_size
    k_src, k_wind, k_veer = jax.random.split(key, 3)
    lo, hi = cfg.source_padding, g - cfg.source_padding
    sources = jax.random.uniform(k_src, (num_fields, 2), jnp.float32, lo, hi)
    theta0 = jax.random.uniform(k_wind, (num_fields,), jnp.float32, 0, 2 * jnp.pi)
    veer = jax.random.uniform(k_veer, (num_fields,), jnp.float32, -1.0, 1.0)

    ix = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).astype(jnp.float32)

    def one_frame(source, theta):
        wind = jnp.stack([jnp.cos(theta), jnp.sin(theta)])
        fs = FieldState(source=source, seed=jnp.uint32(0), wind=wind, idx=jnp.int32(0))
        return _anisotropic_base(fs, ix, iy, cfg)

    def one_field(source, th0, v):
        thetas = th0 + v * jnp.linspace(0.0, 1.0, num_frames)
        return jax.vmap(lambda th: one_frame(source, th))(thetas)

    conc = jax.vmap(one_field)(sources, theta0, veer)
    thetas = theta0[:, None] + veer[:, None] * jnp.linspace(0.0, 1.0, num_frames)
    wind = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)  # [K, T, 2]
    return FieldBank(
        conc=conc, source=sources, wind=wind, steps_per_frame=steps_per_frame
    )


def synthesize_3d_bank(
    key: jax.Array,
    cfg: EnvConfig,
    num_fields: int = 4,
    num_frames: int = 8,
    num_levels: int = 8,
    steps_per_frame: float = 128.0,
    z_extent: float | None = None,
    grid: int | None = None,
    wind_speed: float = 2.0,
) -> FieldBank:
    """Synthetic time-varying 3-D volume bank [K, T, Z, H, W]: anisotropic
    plumes with veering per-frame wind and the Gaussian-dispersion vertical
    profile — a procedural stand-in for real WRF-LES output with the exact
    tensor layout the ingest path produces."""
    from tpu_plume.fields.analytic import FieldState, _anisotropic_base

    g = grid or cfg.grid_size
    ze = cfg.domain_height if z_extent is None else z_extent
    k_src, k_wind, k_veer = jax.random.split(key, 3)
    lo, hi = cfg.source_padding, g - cfg.source_padding
    sources = jax.random.uniform(k_src, (num_fields, 2), jnp.float32, lo, hi)
    theta0 = jax.random.uniform(k_wind, (num_fields,), jnp.float32, 0, 2 * jnp.pi)
    veer = jax.random.uniform(k_veer, (num_fields,), jnp.float32, -1.0, 1.0)

    ix = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).astype(jnp.float32)
    levels = jnp.linspace(0.0, ze, num_levels)

    def one_level(source, theta, zlvl):
        wind = wind_speed * jnp.stack([jnp.cos(theta), jnp.sin(theta)])
        fs = FieldState(source=source, seed=jnp.uint32(0), wind=wind, idx=jnp.int32(0))
        return _anisotropic_base(fs, ix, iy, cfg, z=zlvl)

    def one_frame(source, theta):
        return jax.vmap(lambda zl: one_level(source, theta, zl))(levels)

    def one_field(source, th0, v):
        thetas = th0 + v * jnp.linspace(0.0, 1.0, num_frames)
        return jax.vmap(lambda th: one_frame(source, th))(thetas)

    conc = jax.vmap(one_field)(sources, theta0, veer)  # [K, T, Z, H, W]
    thetas = theta0[:, None] + veer[:, None] * jnp.linspace(0.0, 1.0, num_frames)
    wind = wind_speed * jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)
    return FieldBank(
        conc=conc, source=sources, wind=wind,
        steps_per_frame=steps_per_frame, z_extent=ze,
    )


def synthesize_les_bank(
    key: jax.Array,
    cfg: EnvConfig,
    num_fields: int = 16,
    num_frames: int = 16,
    steps_per_frame: float = 64.0,
    grid: int | None = None,
    num_puffs: int = 12,
    meander_amp: float = 35.0,
    meander_wavelength: float = 160.0,
    width_gain: float = 0.12,
    intermittency: float = 1.5,
) -> FieldBank:
    """Model-MISMATCH surrogate for WRF-LES output (round-5 robustness
    study): time-varying [K, T, H, W] fields deliberately OUTSIDE the
    sigma_y = 0.3 x^0.71 Gaussian-ribbon family every estimator in this
    repo assumes (the reference's README aspires to WRF-LES physics it
    never coded, /root/reference/README.md:50,97 — and every quality
    number measured so far lives on fields drawn from the estimators' own
    dispersion family).

    Ingredients, per field:
      - a MEANDERING, CURVED centerline: crosswind offset
        A*sin(2 pi (s/lambda - t/T)) ramping up downstream (the meander
        advects frame to frame) plus a random quadratic bend (the
        stand-in for spatially varying wind);
      - INTERMITTENT PUFFS: concentration lives in ``num_puffs`` discrete
        along-plume blobs that advect downstream with t and recycle, each
        amplitude-modulated by a random-phase on/off envelope raised to
        ``intermittency`` (sporadic reads, like LES intermittency);
      - LINEAR width growth sigma_n = 2 + width_gain * s (not the 0.3
        s^0.71 power law), along-wind puff stretch 3x;
      - a steady near-source kernel so the release point itself stays the
        field's hot spot (sources remain well-defined targets).

    Same contract as the other synthesizers: per-field max scaled to
    ``cfg.conc_peak``, per-frame wind vectors recorded, round-trips
    through export_bank_netcdf/ingest_netcdf."""
    g = grid or cfg.grid_size
    ks = jax.random.split(key, 8)
    lo, hi = cfg.source_padding, g - cfg.source_padding
    sources = jax.random.uniform(ks[0], (num_fields, 2), jnp.float32, lo, hi)
    theta0 = jax.random.uniform(ks[1], (num_fields,), jnp.float32,
                                0, 2 * jnp.pi)
    bend = jax.random.uniform(ks[2], (num_fields,), jnp.float32, -0.6, 0.6)
    phase = jax.random.uniform(ks[3], (num_fields,), jnp.float32,
                               0, 2 * jnp.pi)
    puff_phase = jax.random.uniform(ks[4], (num_fields, num_puffs),
                                    jnp.float32, 0, 2 * jnp.pi)
    puff_rate = jax.random.uniform(ks[5], (num_fields, num_puffs),
                                   jnp.float32, 0.5, 2.0)
    veer = jax.random.uniform(ks[6], (num_fields,), jnp.float32, -0.5, 0.5)

    ix = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).astype(jnp.float32)
    s_max = 1.1 * g
    spacing = s_max / num_puffs

    def one_frame(src, th, bd, ph, pph, prt, tf):
        # along/cross-wind coordinates of every cell
        dx, dy = ix - src[0], iy - src[1]
        s = dx * jnp.cos(th) + dy * jnp.sin(th)       # downstream
        n = -dx * jnp.sin(th) + dy * jnp.cos(th)      # crosswind
        ramp = jnp.clip(s / meander_wavelength, 0.0, 1.0)
        center = (meander_amp * ramp
                  * jnp.sin(2 * jnp.pi * (s / meander_wavelength - tf)
                            + ph)
                  + bd * s * s / s_max)               # curved centerline
        sig_n = 2.0 + width_gain * jnp.maximum(s, 0.0)
        sig_s = 3.0 * sig_n
        # puff centers advect downstream and recycle over s_max
        sj = jnp.mod(jnp.arange(num_puffs) * spacing
                     + tf * 2.0 * spacing, s_max)     # [P]
        # intermittency envelope: smooth random on/off per puff
        env = jnp.maximum(
            jnp.sin(2 * jnp.pi * (prt * tf) + pph), 0.0
        ) ** intermittency                            # [P]
        amp = env * 30.0 / (sj + 30.0)                # dilution with range
        blob = amp[:, None, None] * jnp.exp(
            -((s[None] - sj[:, None, None]) ** 2
              / (2.0 * sig_s[None] ** 2)
              + (n[None] - center[None]) ** 2
              / (2.0 * sig_n[None] ** 2))
        )                                             # [P, H, W]
        near = jnp.exp(-(dx * dx + dy * dy) / (2.0 * 3.0 ** 2))
        return jnp.sum(blob, axis=0) * (s > -5.0) + near

    def one_field(src, th, bd, ph, pph, prt, vr):
        tfs = jnp.linspace(0.0, 1.0, num_frames)
        f = jax.vmap(lambda tf: one_frame(src, th + vr * tf, bd, ph,
                                          pph, prt, tf))(tfs)
        return f * (cfg.conc_peak / jnp.maximum(jnp.max(f), 1e-6))

    conc = jax.vmap(one_field)(sources, theta0, bend, phase,
                               puff_phase, puff_rate, veer)
    tfs = jnp.linspace(0.0, 1.0, num_frames)
    thetas = theta0[:, None] + veer[:, None] * tfs[None, :]
    wind = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)
    return FieldBank(
        conc=conc, source=sources, wind=wind,
        steps_per_frame=steps_per_frame,
    )


def ingest_netcdf(
    path: str,
    conc_var: str = "concentration",
    source_x_var: str = "source_x",
    source_y_var: str = "source_y",
    wind_u_var: str = "wind_u",
    wind_v_var: str = "wind_v",
    scale_to_peak: float | None = None,
    steps_per_frame: float | None = None,
    z_extent: float | None = None,
) -> FieldBank:
    """Load a bank from a NetCDF/HDF5 file: ``conc_var`` of shape [K, H, W],
    [K, T, H, W], or [K, T, Z, H, W] (leading-K-less variants are promoted to
    K=1) plus per-field source coordinates and, if present, per-frame wind
    components [K, T] (or [K] / [T]).  The data loads once to HBM; optionally
    rescaled so max == ``scale_to_peak``.  ``steps_per_frame`` / ``z_extent``
    default to the file attributes of those names (then 1.0 / num_levels-1)."""
    import h5py

    with h5py.File(path, "r") as f:
        var = f[conc_var]
        conc = np.asarray(var, np.float64)
        # CF-convention unpacking (netCDF4-python / xarray writers): packed
        # integers carry scale_factor/add_offset; missing cells carry
        # _FillValue (or are NaN).  Treat missing as zero concentration.
        vattrs = dict(var.attrs)
        if "_FillValue" in vattrs:
            # _FillValue matches the RAW (packed) value — mask before unpacking
            fill = float(np.asarray(vattrs["_FillValue"]))
            conc = np.where(conc == fill, np.nan, conc)
        if "scale_factor" in vattrs or "add_offset" in vattrs:
            conc = (conc * float(np.asarray(vattrs.get("scale_factor", 1.0)))
                    + float(np.asarray(vattrs.get("add_offset", 0.0))))
        conc = np.nan_to_num(conc, nan=0.0).astype(np.float32)
        if conc.ndim == 2:            # [H, W] -> [1, H, W]
            conc = conc[None]
        attrs = dict(f.attrs)

        def read_coord(name):
            # variable first, then a global attribute (some writers record
            # the release point as file metadata rather than data)
            if name in f:
                return np.atleast_1d(np.asarray(f[name], np.float32))
            if name in attrs:
                return np.atleast_1d(np.asarray(attrs[name], np.float32))
            raise KeyError(
                f"{name} not found in {path} (neither variable nor attribute)"
            )

        sx = read_coord(source_x_var)
        sy = read_coord(source_y_var)
        wind = None
        if wind_u_var in f and wind_v_var in f:
            wu = np.asarray(f[wind_u_var], np.float32)
            wv = np.asarray(f[wind_v_var], np.float32)
            wind = np.stack([wu, wv], axis=-1)     # [K, 2] or [K, T, 2] or [T, 2]
    k = sx.shape[0]
    if conc.shape[0] != k and conc.ndim >= 3:
        # file stored without the K axis ([T, H, W] / [T, Z, H, W]) — promote
        if k == 1:
            conc = conc[None]
        else:
            raise ValueError(
                f"{k} sources for conc shape {conc.shape} in {path}"
            )
    if scale_to_peak is not None and conc.max() > 0:
        conc = conc * (scale_to_peak / conc.max())
    source = np.stack([sx, sy], axis=-1)
    if source.shape[0] != conc.shape[0]:
        raise ValueError(
            f"{source.shape[0]} sources for {conc.shape[0]} fields in {path}"
        )
    if wind is not None and wind.shape[0] != conc.shape[0]:
        if conc.shape[0] == 1:
            wind = wind[None]           # [T, 2] -> [1, T, 2]
        else:
            raise ValueError(f"wind shape {wind.shape} mismatches K={conc.shape[0]}")
    if steps_per_frame is None:
        steps_per_frame = float(attrs.get("steps_per_frame", 1.0))
    if z_extent is None:
        z_extent = float(
            attrs.get("z_extent", conc.shape[2] - 1 if conc.ndim == 5 else 0.0)
        )
    return FieldBank(
        conc=jnp.asarray(conc),
        source=jnp.asarray(source),
        wind=None if wind is None else jnp.asarray(wind),
        steps_per_frame=steps_per_frame,
        z_extent=z_extent,
    )


def export_bank_netcdf(bank: FieldBank, path: str) -> None:
    """Persist a bank in the ingest format (round-trips with ingest_netcdf)."""
    import h5py

    conc = np.asarray(bank.conc)
    src = np.asarray(bank.source)
    with h5py.File(path, "w") as f:
        f.create_dataset("concentration", data=conc, compression="gzip")
        f.create_dataset("source_x", data=src[:, 0])
        f.create_dataset("source_y", data=src[:, 1])
        if bank.wind is not None:
            wind = np.asarray(bank.wind)
            f.create_dataset("wind_u", data=wind[..., 0])
            f.create_dataset("wind_v", data=wind[..., 1])
        f.attrs["steps_per_frame"] = float(bank.steps_per_frame)
        f.attrs["z_extent"] = float(bank.z_extent)
