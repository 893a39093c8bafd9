"""High-level differentiable render API.

Reference analog: gaussiansplatting/gaussian_renderer/__init__.py:45-150
(render) — returns color/depth/visibility/radii; plus the DGE mask
back-projection path (camera2rasterizer + apply_weights,
gaussian_renderer/__init__.py:21-42, gaussian_model.py:817-832) exposed here
as ``render_weights``.

Pipeline: preprocess (projection.py) -> depth sort + tile binning
(binning.py) -> chunked cumprod compositing (composite.py). The whole thing
is one jittable, autodiff-able function; ``mean2d_offset`` is the functional
replacement for the reference's retain_grad screenspace_points trick
(gaussian_renderer/__init__.py:60-68): pass zeros, take grads w.r.t. it to
harvest per-Gaussian screen-space gradients for densification.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dge_tpu.ops import binning, composite, projection
from dge_tpu.scene.gaussians import GaussianScene
from dge_tpu.typing import Bool, Float, Int


class RenderOut(NamedTuple):
    color: Float[jnp.ndarray, "H W 3"]
    depth: Float[jnp.ndarray, "H W"]
    alpha: Float[jnp.ndarray, "H W"]  # 1 - final_T
    radii: Float[jnp.ndarray, "N"]
    visible: Bool[jnp.ndarray, "N"]  # visibility filter
    spill: Int[jnp.ndarray, ""]  # binning overflow (diagnostic)
    # [4] int32 (slot, cap, tile, stream) overflow attribution — which
    # cap class to grow (binning.PairBins.spill_parts); None on the [T, K]
    # list backends
    spill_parts: Int[jnp.ndarray, "4"] = None


def grow_caps(caps: dict, parts) -> dict:
    """One spill-ladder rung: double ONLY the cap classes that overflowed.

    ``caps`` keys: max_per_tile / max_tiles_per_gaussian / small_slots /
    max_pairs / big_capacity. ``parts`` is RenderOut.spill_parts
    ((slot, cap, tile, stream) int32, binning.PairBins) or None — None
    doubles everything (the legacy behavior). Selective growth keeps
    binning sort rows bounded: the round-5 1080p ladder that doubled
    everything overshot big_capacity 4x and paid 22.6 ms of sort on a
    63 ms frame; slot-vs-capacity separation stops max_tiles_per_gaussian
    overflow from also doubling small_slots and big_capacity."""
    if parts is None:
        wants = [True] * 4
    else:
        p = [int(x) for x in parts]
        if len(p) == 3:  # legacy (gauss, tile, stream)
            p = [p[0], p[0], p[1], p[2]]
        wants = [x > 0 for x in p]
    c = dict(caps)
    slot, cap, tile, stream = wants
    if slot:
        c["max_tiles_per_gaussian"] = min(
            c["max_tiles_per_gaussian"] * 2, 256)
    if cap:
        c["small_slots"] = min(c["small_slots"] * 2, 32)
        # 0 = the binning auto default (n/32 capped) — jump past it
        # rather than shrinking to a fixed small number
        c["big_capacity"] = (c["big_capacity"] * 2 if c["big_capacity"]
                             else 8192)
    if tile:
        c["max_per_tile"] = c["max_per_tile"] * 2
    if stream:
        c["max_pairs"] = c["max_pairs"] * 2
    # NB: when every attributed class is already at its ceiling the caps
    # come back UNCHANGED — callers must treat that as an irreducible
    # residual (e.g. needle scenes where single Gaussians genuinely span
    # more than 256 tiles) and stop, NOT fall back to growing unrelated
    # caps: growing max_pairs to 2^23 cannot reduce a slot-class spill by
    # definition (measured runaway on the hi-aniso scene, round 5).
    return c


def render(
    scene: GaussianScene,
    cam,
    bg: Optional[Float[jnp.ndarray, "3"]] = None,
    *,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    max_tiles_per_gaussian: int = 32,
    max_pairs: int = 0,
    big_capacity: int = 0,
    small_slots: int = 4,
    scale_modifier: float = 1.0,
    override_color: Optional[Float[jnp.ndarray, "N 3"]] = None,
    mean2d_offset: Optional[Float[jnp.ndarray, "N 2"]] = None,
    chunk: int = 64,
    backend: str = "jnp",
    tight_cull: bool = False,
    slim_gather: bool = True,
) -> RenderOut:
    """backend: "jnp" (differentiable, XLA-fused) or "pallas" (TPU Mosaic
    forward kernel, fastest inference path).

    ``tight_cull`` drops (Gaussian, tile) pairs no pixel of which can pass
    the kernels' alpha >= 1/255 skip (binning.tile_keep_mask) — exact for
    color, depth AND gradients; measured 2.15x fewer pairs on a trained
    (anisotropic) scene, but the mask math costs ~1.4 ms at 131k Gaussians,
    a net loss on near-isotropic scenes — hence off by default here and
    enabled adaptively by FitLoop.react_to_spill."""
    bg = jnp.zeros(3, jnp.float32) if bg is None else jnp.asarray(bg, jnp.float32)

    prep = projection.preprocess(
        scene.xyz,
        scene.get_scaling,
        scene.get_rotation,
        scene.get_opacity,
        scene.get_features,
        scene.alive,
        cam,
        scene.active_sh_degree,
        scene.max_sh_degree,
        scale_modifier=scale_modifier,
        override_color=override_color,
    )
    mean2d = prep.mean2d
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    # tight culling feeds only integer pair ids; stop_gradient keeps the
    # cull math out of the backward graph like the other binning inputs
    cull_kw = dict(
        conic=jax.lax.stop_gradient(prep.conic) if tight_cull else None,
        opacity=jax.lax.stop_gradient(prep.opacity) if tight_cull else None,
    )

    if backend == "pallas_train":
        # differentiable fast path: Pallas forward AND backward for the
        # compositing (custom_vjp); preprocess stays jnp-autodiff
        from dge_tpu.ops import pallas_backward

        pb = binning.bin_gaussians_pairs(
            jax.lax.stop_gradient(mean2d),
            jax.lax.stop_gradient(prep.depth),
            jax.lax.stop_gradient(prep.radius),
            prep.visible,
            height=cam.height,
            width=cam.width,
            tile_px=tile_px,
            max_per_tile=max_per_tile,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            max_pairs=max_pairs,
            big_capacity=big_capacity,
            small_slots=small_slots,
            **cull_kw,
        )
        color, depth, final_t = pallas_backward.stream_composite(
            mean2d,
            prep.conic,
            prep.rgb,
            prep.depth,
            prep.opacity,
            pb.pair_ids,
            pb.starts,
            pb.counts,
            cam.height,
            cam.width,
            pb.tiles_x,
            pb.tiles_y,
            tile_px,
            max_per_tile,
            max(chunk, 128),
        )
        color = color + final_t[..., None] * bg[None, None, :]
        return RenderOut(
            color=color,
            depth=depth,
            alpha=1.0 - final_t,
            radii=prep.radius,
            visible=prep.visible,
            spill=pb.spill,
            spill_parts=pb.spill_parts,
        )

    if backend == "pallas_stream":
        # NB a block-aligned stream variant (one kernel cell per real pair
        # block instead of the (tile, slot) grid) was built and measured in
        # rounds 2-3: it lost at EVERY operating point — 23.8 vs 9.9 ms at
        # 131k/512^2, 89.3 vs 43.2 ms at 1080p/tile 32, 49.8 vs 30.2 ms at
        # 1080p/tile 64 — because its stream re-alignment pass re-gathers
        # the whole feature stream (structural, not tunable), so it was
        # deleted (VERDICT r2 item 2). For skewed/high-res loads, grow
        # tile_px instead (64 at 1080p) — see bench.py.
        from dge_tpu.ops import pallas_composite

        pb = binning.bin_gaussians_pairs(
            jax.lax.stop_gradient(mean2d),
            jax.lax.stop_gradient(prep.depth),
            jax.lax.stop_gradient(prep.radius),
            prep.visible,
            height=cam.height,
            width=cam.width,
            tile_px=tile_px,
            max_per_tile=max_per_tile,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            max_pairs=max_pairs,
            big_capacity=big_capacity,
            small_slots=small_slots,
            **cull_kw,
        )
        color, depth, final_t = pallas_composite.composite_pairs_pallas(
            pb.pair_ids,
            pb.starts,
            pb.counts,
            mean2d,
            prep.conic,
            prep.rgb,
            prep.depth,
            prep.opacity,
            height=cam.height,
            width=cam.width,
            tiles_x=pb.tiles_x,
            tiles_y=pb.tiles_y,
            tile_px=tile_px,
            bg=bg,
            max_per_tile=max_per_tile,
            chunk=max(chunk, 128),
            slim_gather=slim_gather,
        )
        return RenderOut(
            color=color,
            depth=depth,
            alpha=1.0 - final_t,
            radii=prep.radius,
            visible=prep.visible,
            spill=pb.spill,
            spill_parts=pb.spill_parts,
        )

    if backend not in ("jnp", "pallas"):
        raise ValueError(f"unknown render backend {backend!r}")
    bins = binning.bin_gaussians(
        jax.lax.stop_gradient(mean2d),
        jax.lax.stop_gradient(prep.depth),
        jax.lax.stop_gradient(prep.radius),
        prep.visible,
        height=cam.height,
        width=cam.width,
        tile_px=tile_px,
        max_per_tile=max_per_tile,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        **cull_kw,
    )
    order = bins.order  # None = lists hold original ids

    if backend == "pallas":
        from dge_tpu.ops import pallas_composite

        color, depth, final_t = pallas_composite.composite_tiles_pallas(
            bins.lists,
            bins.counts,
            mean2d,
            prep.conic,
            prep.rgb,
            prep.depth,
            prep.opacity,
            order=order,
            height=cam.height,
            width=cam.width,
            tiles_x=bins.tiles_x,
            tiles_y=bins.tiles_y,
            tile_px=tile_px,
            bg=bg,
            chunk=max(chunk, 128),
        )
        return RenderOut(
            color=color,
            depth=depth,
            alpha=1.0 - final_t,
            radii=prep.radius,
            visible=prep.visible,
            spill=bins.spill,
        )

    def by_order(x):
        return x if order is None else x[order]

    out = composite.composite(
        bins.lists,
        bins.counts,
        by_order(mean2d),
        by_order(prep.conic),
        by_order(prep.rgb),
        by_order(prep.depth),
        by_order(prep.opacity),
        height=cam.height,
        width=cam.width,
        tiles_x=bins.tiles_x,
        tiles_y=bins.tiles_y,
        tile_px=tile_px,
        bg=bg,
        spill=bins.spill,
        chunk=chunk,
    )
    return RenderOut(
        color=out.color,
        depth=out.depth,
        alpha=1.0 - out.final_T,
        radii=prep.radius,
        visible=prep.visible,
        spill=out.spill,
    )


def render_point_cloud(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    cam,
    *,
    point_size: float = 0.01,
    opacity: float = 0.99,
    bg: Optional[jnp.ndarray] = None,
    **render_kw,
) -> RenderOut:
    """Render a raw colored point cloud as isotropic Gaussians
    (point_cloud_render, gaussian_renderer/__init__.py:156-250)."""
    import numpy as np

    from dge_tpu.scene import gaussians as G

    pts = np.asarray(points, np.float32)
    n = len(pts)
    rot = np.zeros((n, 4), np.float32)
    rot[:, 0] = 1.0
    scene = G.from_arrays(
        pts,
        G.rgb_to_sh(np.asarray(colors, np.float32)).reshape(n, 1, 3),
        np.zeros((n, 0, 3), np.float32),
        np.full((n, 1), np.log(opacity / (1 - opacity)), np.float32),
        np.full((n, 3), np.log(point_size), np.float32),
        rot,
        max_sh_degree=0,
    )
    return render(scene, cam, bg, **render_kw)


class SpillFreeRenderer:
    """Adaptive-cap renderer for EVAL paths (render CLI, metrics eval,
    orbit export).

    The static-shape binning truncates when its caps are exceeded
    (nonzero ``RenderOut.spill``), and FitLoop grows caps adaptively
    during training — so a trained scene rendered at default caps can
    silently lose its biggest Gaussians (measured 5.6 dB PSNR loss on a
    6k-step fit). The CUDA reference can never hit this: it allocates
    exactly ``num_rendered`` pairs per frame (rasterizer_impl.cu:237).
    Every evaluation path must therefore probe-and-grow until spill == 0;
    this class centralizes the ladder (previously inlined in
    tools/full_eval.py; VERDICT r3 / ADVICE r3).

    Usage::

        r = SpillFreeRenderer(scene, bg, backend="jnp")
        r.probe(cams[0])              # grow caps on a representative view
        for cam in cams:
            color, spill = r(cam)     # re-grows if this view still spills

    The FIRST rung enables exact tight tile culling (the FitLoop rung
    order): on anisotropic trained scenes culling removes the spilling
    rect-inflation pairs outright — measured 2.3x on the p90-aspect-147
    artifact (26.9 vs 61.0 ms at 512^2) — so caps often need no growth at
    all. Subsequent rungs double only the overflowing cap class
    (grow_caps + RenderOut.spill_parts).
    """

    def __init__(self, scene, bg=None, *, log=None, max_grow=8, **render_kw):
        self._scene = scene
        self._bg = bg
        self._max_grow = max_grow
        self._log = log if log is not None else (lambda msg: None)
        n = int(scene.capacity)
        caps = dict(
            max_per_tile=4096,
            max_tiles_per_gaussian=32,
            small_slots=4,
            # start at the bin_gaussians_pairs auto defaults so the ladder
            # doubles from where the backend would have started
            max_pairs=max(1 << 18, 1 << int(2 * n - 1).bit_length()),
            big_capacity=1 << max(int(n // 32 - 1).bit_length(), 6),
        )
        for k in list(caps):
            if k in render_kw:
                v = render_kw.pop(k)
                # render()'s 0/None sentinels mean "auto"; storing them
                # here would make the doubling ladder multiply 0 forever.
                if v:
                    caps[k] = v
        self._caps = caps
        self._kw = render_kw
        self._fwd = self._make()

    @property
    def caps(self):
        return dict(self._caps)

    def _make(self):
        kw = dict(self._kw, **self._caps)
        bg = self._bg
        return jax.jit(
            lambda s, c: (lambda o: (o.color, o.spill, o.spill_parts))(
                render(s, c, bg, **kw))
        )

    def _grow(self, sp: int, parts=None):
        """One ladder rung. Returns "cull" (free rung: enabled culling),
        "grew" (caps doubled), or "stuck" (attributed classes at their
        ceilings — irreducible residual, callers should stop)."""
        if not self._kw.get("tight_cull"):
            # rung 0: cull before paying for capacity (exact, and the
            # spilling pairs are usually exactly the cullable ones)
            self._kw["tight_cull"] = True
            self._log(f"render spill {sp}: enabling tight_cull")
            self._fwd = self._make()
            return "cull"
        new = grow_caps(self._caps, parts)
        if new == self._caps:
            self._log(f"render spill {sp}: caps at ceilings — "
                      "irreducible residual")
            return "stuck"
        self._caps = new
        self._log(f"render spill {sp} (parts "
                  f"{None if parts is None else [int(x) for x in parts]}"
                  f"): growing caps to {self._caps}")
        self._fwd = self._make()
        return "grew"

    def probe(self, cam) -> int:
        """Grow caps until ``cam`` renders with spill == 0 (or max_grow
        rungs are exhausted — returns the residual spill, 0 on success)."""
        sp = 0
        grows = 0
        while grows < self._max_grow:
            _, sp, parts = self._fwd(self._scene, cam)
            if int(sp) == 0:
                return 0
            rung = self._grow(int(sp), parts)
            if rung == "stuck":
                return int(sp)
            grows += 1 if rung == "grew" else 0
        # ladder exhausted after a final grow: re-probe so the reported
        # residual matches the caps actually in effect
        _, sp, _ = self._fwd(self._scene, cam)
        return int(sp)

    def __call__(self, cam, regrow: int = 4):
        """Render one view spill-free, re-growing caps (``regrow`` rungs)
        if this view is denser than the probe view. Returns (color, spill);
        spill > 0 only if the ladder was exhausted."""
        color, sp, parts = self._fwd(self._scene, cam)
        for _ in range(regrow):
            if int(sp) == 0:
                break
            if self._grow(int(sp), parts) == "stuck":
                break
            color, sp, parts = self._fwd(self._scene, cam)
        return color, int(sp)


def render_weights(
    scene: GaussianScene,
    cam,
    mask_img: Float[jnp.ndarray, "H W"],
    *,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    max_tiles_per_gaussian: int = 32,
    chunk: int = 64,
):
    """Back-project a per-pixel mask to per-Gaussian (weights, hit counts).

    Reference analog: GaussianModel.apply_weights -> applyWeightsGaussiansCUDA
    (gaussian_model.py:817-832, cuda_rasterizer/apply_weights.cu). Used to
    lift SAM masks to Gaussian space for local editing.
    """
    prep = projection.preprocess(
        scene.xyz,
        scene.get_scaling,
        scene.get_rotation,
        scene.get_opacity,
        scene.get_features,
        scene.alive,
        cam,
        scene.active_sh_degree,
        scene.max_sh_degree,
    )
    bins = binning.bin_gaussians(
        prep.mean2d,
        prep.depth,
        prep.radius,
        prep.visible,
        height=cam.height,
        width=cam.width,
        tile_px=tile_px,
        max_per_tile=max_per_tile,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        # exact tight culling: lift_weights skips alpha < 1/255 like the
        # color kernels (composite._effective_alpha)
        conic=prep.conic,
        opacity=prep.opacity,
    )
    order = bins.order

    def by_order(x):
        return x if order is None else x[order]

    return composite.lift_weights(
        bins.lists,
        bins.counts,
        order,
        by_order(prep.mean2d),
        by_order(prep.conic),
        by_order(prep.opacity),
        mask_img.astype(jnp.float32),
        num_gaussians=scene.capacity,
        height=cam.height,
        width=cam.width,
        tiles_x=bins.tiles_x,
        tiles_y=bins.tiles_y,
        tile_px=tile_px,
        chunk=chunk,
    )
