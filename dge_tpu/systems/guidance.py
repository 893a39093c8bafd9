"""DGE guidance: multi-view-consistent InstructPix2Pix editing.

Reference analog: DGEGuidance (threestudio/models/guidance/dge_guidance.py,
registered "dge-guidance") — the 20-step truncated DDIM edit loop with
per-batch random pivots, extended attention over pivots, and
epipolar-constrained pivot-attention reuse for non-pivot views
(edit_latents :246-374), IP2P 3-way CFG (:362-368), SDS mode
(compute_grad_sds :376-475), and timestep-gated plain attention below t=100
(use_normal_unet :237-244).

TPU re-architecture: no monkey patching — the UNet takes an attention
``mode`` plus a CrossViewState; pivot state rides a flax variable
collection. Closest-camera search and epipolar masks are computed once per
(step, batch) outside the network (the reference recomputes them inside
every transformer block).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import dge_tpu
from dge_tpu.diffusion import ddim, epipolar
from dge_tpu.diffusion import ip2p as P
from dge_tpu.models.layers import CrossViewState
from dge_tpu.parallel.mesh import index_cameras, stack_cameras
from dge_tpu.typing import Float


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """configs/dge.yaml guidance defaults (dge_guidance.py:34-51)."""

    guidance_scale: float = 7.5
    condition_scale: float = 1.5
    camera_batch_size: int = 5
    diffusion_steps: int = 20
    use_sds: bool = False
    min_step_percent: float = 0.02
    max_step_percent: float = 0.98
    normal_attn_below_t: int = 100
    epipolar_threshold: float = 1.0
    # "banded": 3 line coefficients per query token, distance test evaluated
    # blockwise inside the pivot-reuse gather — nothing S x S materializes,
    # so 64x64 latents (S=4096) fit on one chip. "dense": the reference's
    # full [S, S] violation masks (oracle for tests at small S).
    epipolar_mode: str = "banded"
    # long-side target of the pre-VAE resize (dge_guidance.py:505-511 uses
    # 512); tests lower it to keep latent sizes sane with tiny VAEs
    resize_target: int = 512
    # VAE encode/decode batch: full-size decoder activations at 512^2 are
    # ~1.3 GB per conv buffer per 20 views — chunk to fit one chip
    vae_batch: int = 5
    # how the per-step camera batches run: "loop" (sequential, reference
    # semantics incl. 1-key first batch), "vmap" (all batches in one batched
    # UNet call, uniform 2-key state; batch 0 duplicates its closest key
    # with blend 1.0 — numerically identical to 1-key), or "shard"
    # (same uniform state, batches sharded over a device mesh axis)
    batch_mode: str = "loop"


def _gather_cams(cams, idx):
    """Select a subset of a stacked CameraArrays by (traced or static)
    indices."""
    return type(cams)(
        w2c=cams.w2c[idx],
        full_proj=cams.full_proj[idx],
        campos=cams.campos[idx],
        tan_half_fovx=cams.tan_half_fovx[idx],
        tan_half_fovy=cams.tan_half_fovy[idx],
        height=cams.height,
        width=cams.width,
    )


@partial(
    jax.jit,
    static_argnames=("latent_h", "latent_w", "n_key", "threshold", "mode"),
)
def make_cross_view_state(
    cams_b,
    key_cams,
    pivot_in_batch: jnp.ndarray,
    latent_h: int,
    latent_w: int,
    n_key: int,
    threshold: float = 1.0,
    mode: str = "banded",
) -> CrossViewState:
    """Closest key cams, distance blend, and per-resolution epipolar
    constraints for one camera batch.

    Mirrors the per-block state of make_dge_block (closest_cam search
    :407-424, w1 blend :557-566) and the per-batch mask precompute of
    edit_latents (:329-342), with the pivot frame's rows cleared
    (:493-496).

    mode="banded" (production): stores normalized epipolar-line
    coefficients [F, n_key, S, 3] per resolution; the distance>threshold
    test runs blockwise inside the attention gather (layers.
    epi_blockwise_argmax) so no [S, S] mask is ever built — at the real
    64x64 latent (S=4096) the dense form is 168M bools per resolution and
    OOMs, the banded form is 0.5 MB. mode="dense": the reference-shaped
    [F, n_key, S, S] masks (test oracle)."""
    d = epipolar.camera_distances(cams_b.campos, key_cams.campos)  # [F, K]
    closest = jnp.argsort(d, axis=-1)[:, :n_key]  # [F, n_key]
    dsort = jnp.sort(d, axis=-1)
    if n_key == 2:
        w1 = jax.nn.sigmoid(dsort[:, 1] / (dsort[:, 0] + dsort[:, 1] + 1e-12))
    else:
        w1 = jnp.ones((d.shape[0],), jnp.float32)

    f = d.shape[0]
    key_sel = _gather_cams(key_cams, closest.reshape(-1))  # [F*n_key]
    masks: Dict[int, jnp.ndarray] = {}
    lines_d: Dict[int, jnp.ndarray] = {}
    pts_d: Dict[int, jnp.ndarray] = {}
    for ds in (1, 2, 4, 8):
        h, w = latent_h // ds, latent_w // ds
        if h < 1 or w < 1:
            continue
        s = h * w

        def pix_proj(cam, hh, ww):
            ndc2pix = jnp.array(
                [[ww / 2.0, 0, ww / 2.0], [0, hh / 2.0, hh / 2.0], [0, 0, 1.0]],
                jnp.float32,
            )
            return ndc2pix @ cam.full_proj[jnp.array([0, 1, 3]), :]

        pk = jax.vmap(lambda c: pix_proj(c, h, w))(key_sel)  # [F*n_key, 3, 4]
        pq = jax.vmap(lambda c: pix_proj(c, h, w))(cams_b)  # [F, 3, 4]
        pq_rep = jnp.repeat(pq, n_key, axis=0)  # [F*n_key, 3, 4]
        frame_ids = jnp.arange(f)
        is_pivot = frame_ids == pivot_in_batch

        if mode == "banded":

            def pair_lines(key_cam_fp, query_cam_fp):
                fm = epipolar.fundamental_from_projections(
                    key_cam_fp, query_cam_fp
                )
                return epipolar.epipolar_lines(fm, h, w)

            ln = jax.vmap(pair_lines)(pk, pq_rep)  # [F*n_key, S, 3]
            ln = ln.reshape(f, n_key, s, 3)
            # the pivot frame is unconstrained: zero lines => distance 0
            ln = jnp.where(is_pivot[:, None, None, None], 0.0, ln)
            lines_d[s] = ln
            pts_d[s] = epipolar._pixel_grid(h, w)
        else:

            def pair_mask(key_cam_fp, query_cam_fp):
                fm = epipolar.fundamental_from_projections(
                    key_cam_fp, query_cam_fp
                )
                return epipolar.epipolar_distances(fm, h, w) > threshold

            m = jax.vmap(pair_mask)(pk, pq_rep)  # [F*n_key, S, S]
            m = m.reshape(f, n_key, s, s)
            m = jnp.where(is_pivot[:, None, None, None], False, m)
            masks[s] = m
    return CrossViewState(
        closest_cam=closest,
        blend_w1=w1,
        epipolar=masks or None,
        epi_lines=lines_d or None,
        epi_pts=pts_d or None,
        n_key=n_key,
        epi_threshold=threshold,
    )


@dge_tpu.register("dge-guidance")
class DGEGuidance:
    def __init__(self, cfg: GuidanceConfig, models: P.IP2PModels):
        self.cfg = cfg
        self.models = models
        self.min_step = int(
            models.schedule.num_train_timesteps * cfg.min_step_percent
        )
        self.max_step = int(
            models.schedule.num_train_timesteps * cfg.max_step_percent
        )
        self._jit_cache: Dict = {}

    # ---- jitted UNet passes (cached per shape signature) ----
    def _pivot_fn(self):
        if "pivot" not in self._jit_cache:

            @jax.jit
            def fn(unet_params, inp, t, temb):
                return self.models.unet.apply(
                    {"params": unet_params},
                    inp,
                    jnp.full((inp.shape[0],), t),
                    temb,
                    mode="pivot_record",
                    mutable=["pivot"],
                )

            self._jit_cache["pivot"] = fn
        return self._jit_cache["pivot"]

    def _batch_fn(self, n_key: int):
        key = ("batch", n_key)
        if key not in self._jit_cache:

            @jax.jit
            def fn(unet_params, pivot_vars, inp, t, temb, cross_view):
                return self.models.unet.apply(
                    {"params": unet_params, "pivot": pivot_vars},
                    inp,
                    jnp.full((inp.shape[0],), t),
                    temb,
                    mode="pivot_reuse",
                    cross_view=cross_view,
                )

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def _plain_fn(self):
        if "plain" not in self._jit_cache:

            @jax.jit
            def fn(unet_params, inp, t, temb):
                return self.models.unet.apply(
                    {"params": unet_params},
                    inp,
                    jnp.full((inp.shape[0],), t),
                    temb,
                    mode="plain",
                )

            self._jit_cache["plain"] = fn
        return self._jit_cache["plain"]

    # ---- the edit loop ----
    def edit_latents(
        self,
        text_emb: jnp.ndarray,  # [3B, S, D] (pos, neg, neg)
        latents: jnp.ndarray,  # [B, h, w, 4]
        cond_latents: jnp.ndarray,  # [3B, h, w, 4] (img, img, zeros)
        t_start: int,
        cams,
        rng: jax.Array,
    ) -> jnp.ndarray:
        cfg = self.cfg
        models = self.models
        b = latents.shape[0]
        cbs = cfg.camera_batch_size
        assert b % cbs == 0, f"views {b} must be a multiple of batch {cbs}"
        n_batches = b // cbs
        lat_h, lat_w = latents.shape[1], latents.shape[2]

        sched = models.schedule._replace(
            num_train_timesteps=max(t_start, cfg.diffusion_steps)
        )
        ts = ddim.inference_timesteps(sched, cfg.diffusion_steps)
        rng, r_noise = jax.random.split(rng)
        noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
        latents = ddim.add_noise(sched, latents, noise, jnp.full((b,), t_start))

        emb_pos, emb_neg, _ = jnp.split(text_emb, 3, axis=0)
        cond_img, _, cond_zero = jnp.split(cond_latents, 3, axis=0)

        def triple_for(idx):
            """CFG triplet [pos, neg, neg] embeddings and [img, img, zero]
            conditioning latents for a view subset."""
            te = jnp.concatenate([emb_pos[idx], emb_neg[idx], emb_neg[idx]], 0)
            cl = jnp.concatenate([cond_img[idx], cond_img[idx], cond_zero[idx]], 0)
            return te, cl

        for t in ts:
            rng, r_step = jax.random.split(rng)
            eps_final = self._predict_eps_multiview(
                latents, int(t), cams, triple_for, b, cbs, n_batches,
                lat_h, lat_w, r_step,
            )
            latents = ddim.step(
                sched, eps_final, jnp.asarray(int(t)), latents,
                cfg.diffusion_steps,
            )
        return latents

    def _predict_eps_multiview(
        self, latents, t, cams, triple_for, b, cbs, n_batches, lat_h, lat_w,
        rng,
    ):
        """One CFG-combined multi-view noise prediction at timestep t —
        the body of the reference's edit_latents / compute_grad_sds
        (dge_guidance.py:289-371, 376-475): plain attention below t=100,
        otherwise pivot pass + epipolar-constrained reuse per camera
        batch."""
        cfg = self.cfg
        models = self.models

        if t < cfg.normal_attn_below_t:
            # plain attention (use_normal_unet, dge_guidance.py:289-296) —
            # per camera batch like the reference loop (one batch-3*B call
            # would be 4x the peak activation memory at full size)
            eps_chunks = []
            for i in range(n_batches):
                sl = jnp.arange(i * cbs, min((i + 1) * cbs, b))
                te, cl = triple_for(sl)
                inp = jnp.concatenate([P.triple(latents[sl]), cl], axis=-1)
                eps_chunks.append(
                    self._plain_fn()(
                        models.unet_params, inp, jnp.asarray(t), te
                    )
                )
            e_t = jnp.concatenate([jnp.split(e, 3)[0] for e in eps_chunks], 0)
            e_i = jnp.concatenate([jnp.split(e, 3)[1] for e in eps_chunks], 0)
            e_u = jnp.concatenate([jnp.split(e, 3)[2] for e in eps_chunks], 0)
            return P.cfg_combine(
                e_t, e_i, e_u, cfg.guidance_scale, cfg.condition_scale
            )

        # one random pivot per camera batch (edit_latents :305)
        piv_off = np.asarray(jax.random.randint(rng, (n_batches,), 0, cbs))
        pivotal_idx = piv_off + np.arange(0, b, cbs)
        key_cams = _gather_cams(cams, jnp.asarray(pivotal_idx))

        # pivot pass over all key frames (extended attention, recorded)
        piv = jnp.asarray(pivotal_idx)
        te_p, cl_p = triple_for(piv)
        inp_p = jnp.concatenate([P.triple(latents[piv]), cl_p], axis=-1)
        _, pivot_vars = self._pivot_fn()(
            models.unet_params, inp_p, jnp.asarray(t), te_p
        )

        if cfg.batch_mode in ("vmap", "shard"):
            return self._batched_reuse(
                latents, cams, key_cams, piv_off, t, lat_h, lat_w,
                triple_for, n_batches, cbs, pivot_vars,
            )

        # per-batch non-pivot pass with pivot reuse
        eps_chunks = []
        for i in range(n_batches):
            sl = jnp.arange(i * cbs, (i + 1) * cbs)
            cams_b = _gather_cams(cams, sl)
            n_key = 1 if i == 0 else 2  # make_dge_block batch_idxs
            cv = make_cross_view_state(
                cams_b,
                key_cams,
                jnp.asarray(piv_off[i]),
                lat_h,
                lat_w,
                n_key,
                cfg.epipolar_threshold,
                cfg.epipolar_mode,
            )
            te_b, cl_b = triple_for(sl)
            inp_b = jnp.concatenate([P.triple(latents[sl]), cl_b], axis=-1)
            eps_b = self._batch_fn(n_key)(
                models.unet_params,
                pivot_vars["pivot"],
                inp_b,
                jnp.asarray(t),
                te_b,
                cv,
            )
            eps_chunks.append(eps_b)

        e_t = jnp.concatenate([jnp.split(e, 3)[0] for e in eps_chunks], 0)
        e_i = jnp.concatenate([jnp.split(e, 3)[1] for e in eps_chunks], 0)
        e_u = jnp.concatenate([jnp.split(e, 3)[2] for e in eps_chunks], 0)
        return P.cfg_combine(
            e_t, e_i, e_u, cfg.guidance_scale, cfg.condition_scale
        )

    def _batched_reuse(
        self, latents, cams, key_cams, piv_off, t, lat_h, lat_w,
        triple_for, n_batches, cbs, pivot_vars,
    ):
        """All camera batches in one vmapped (or view-mesh-sharded) UNet
        call with uniform 2-key cross-view state — the multi-chip edit-round
        parallelism of SURVEY.md §2.6 (view batches sharded across chips,
        pivot hidden states replicated)."""
        cfg = self.cfg
        states = []
        inps, tes = [], []
        for i in range(n_batches):
            sl = jnp.arange(i * cbs, (i + 1) * cbs)
            cams_b = _gather_cams(cams, sl)
            cv = make_cross_view_state(
                cams_b, key_cams, jnp.asarray(piv_off[i]), lat_h, lat_w, 2,
                cfg.epipolar_threshold, cfg.epipolar_mode,
            )
            if i == 0:
                # reference batch 0 uses a single key: duplicate the closest
                # key with blend 1.0 (exactly equivalent)
                def dup(d):
                    if d is None:
                        return None
                    return {
                        s: jnp.stack([m[:, 0], m[:, 0]], axis=1)
                        for s, m in d.items()
                    }

                cv = cv.replace(
                    closest_cam=jnp.stack(
                        [cv.closest_cam[:, 0], cv.closest_cam[:, 0]], axis=1
                    ),
                    blend_w1=jnp.ones_like(cv.blend_w1),
                    epipolar=dup(cv.epipolar),
                    epi_lines=dup(cv.epi_lines),
                )
            states.append(cv)
            te_b, cl_b = triple_for(sl)
            inps.append(jnp.concatenate([P.triple(latents[sl]), cl_b], axis=-1))
            tes.append(te_b)

        cv_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *states
        )
        inp = jnp.stack(inps)  # [nb, 3F, h, w, 8]
        te = jnp.stack(tes)

        key = ("batched_reuse", cfg.batch_mode)
        if key not in self._jit_cache:
            unet = self.models.unet

            def one(params, pv, inp_b, t_b, te_b, cv_b):
                return unet.apply(
                    {"params": params, "pivot": pv},
                    inp_b, jnp.full((inp_b.shape[0],), t_b), te_b,
                    mode="pivot_reuse", cross_view=cv_b,
                )

            if cfg.batch_mode == "shard":
                from jax.sharding import Mesh, PartitionSpec as Ps
                import numpy as _np

                devs = jax.devices()
                nd = max(d for d in range(1, len(devs) + 1) if n_batches % d == 0)
                mesh = Mesh(_np.array(devs[:nd]), ("batch",))

                def fn(params, pv, inp, t_b, te, cv):
                    body = jax.vmap(one, in_axes=(None, None, 0, None, 0, 0))
                    shard = jax.shard_map(
                        lambda p, v, i_, tt, te_, cv_: body(p, v, i_, tt, te_, cv_),
                        mesh=mesh,
                        in_specs=(Ps(), Ps(), Ps("batch"), Ps(), Ps("batch"),
                                  Ps("batch")),
                        out_specs=Ps("batch"),
                        check_vma=False,
                    )
                    return shard(params, pv, inp, t_b, te, cv)

            else:

                def fn(params, pv, inp, t_b, te, cv):
                    return jax.vmap(one, in_axes=(None, None, 0, None, 0, 0))(
                        params, pv, inp, t_b, te, cv
                    )

            self._jit_cache[key] = jax.jit(fn)

        eps = self._jit_cache[key](
            self.models.unet_params, pivot_vars["pivot"], inp, jnp.asarray(t),
            te, cv_stack,
        )  # [nb, 3F, h, w, 4]
        e_t = jnp.concatenate([e[0 * cbs : 1 * cbs] for e in eps], 0)
        e_i = jnp.concatenate([e[1 * cbs : 2 * cbs] for e in eps], 0)
        e_u = jnp.concatenate([e[2 * cbs : 3 * cbs] for e in eps], 0)
        return P.cfg_combine(
            e_t, e_i, e_u, cfg.guidance_scale, cfg.condition_scale
        )

    def __call__(
        self,
        rgb: "Float[jnp.ndarray, 'B H W 3']",  # current renders in [0, 1]
        cond_rgb: "Float[jnp.ndarray, 'B H W 3']",  # original renders
        text_emb_pos: "Float[jnp.ndarray, 'B S D']",
        text_emb_neg: "Float[jnp.ndarray, 'B S D']",
        cams,
        rng: jax.Array,
        max_step: Optional[int] = None,
    ) -> "Float[jnp.ndarray, 'B H W 3']":
        """Edit all views (guidance __call__, dge_guidance.py:480-569).
        Returns edited images at the input resolution."""
        b, h, w, _ = rgb.shape
        rh, rw = P.resize_to_64_multiple(h, w, self.cfg.resize_target)
        if (rh, rw) != (h, w):
            rgb_r = jax.image.resize(rgb, (b, rh, rw, 3), "bilinear")
            cond_r = jax.image.resize(cond_rgb, (b, rh, rw, 3), "bilinear")
        else:
            rgb_r, cond_r = rgb, cond_rgb

        rng, r_enc = jax.random.split(rng)
        latents = P.encode_images(
            self.models, rgb_r, r_enc, chunk=self.cfg.vae_batch
        )
        cond_latents = P.encode_cond_images(
            self.models, cond_r, chunk=self.cfg.vae_batch
        )
        text_emb = jnp.concatenate(
            [text_emb_pos, text_emb_neg, text_emb_neg], axis=0
        )
        t_start = (max_step if max_step is not None else self.max_step) - 1
        edited = self.edit_latents(
            text_emb, latents, cond_latents, t_start, cams, rng
        )
        imgs = P.decode_latents(self.models, edited, chunk=self.cfg.vae_batch)
        if (rh, rw) != (h, w):
            imgs = jax.image.resize(imgs, (b, h, w, 3), "bilinear")
        return imgs

    def update_step(
        self,
        min_step_percent: Optional[float] = None,
        max_step_percent: Optional[float] = None,
    ) -> None:
        """Anneal the noise-level window (DGEGuidance.update_step,
        dge_guidance.py:571-586; driven by C() schedules in configs)."""
        n = self.models.schedule.num_train_timesteps
        if min_step_percent is not None:
            self.min_step = int(n * min_step_percent)
        if max_step_percent is not None:
            self.max_step = int(n * max_step_percent)

    def sds_multiview(
        self,
        rgb: jnp.ndarray,
        cond_rgb: jnp.ndarray,
        text_emb_pos: jnp.ndarray,
        text_emb_neg: jnp.ndarray,
        cams,
        rng: jax.Array,
        t: Optional[int] = None,
    ):
        """Full multi-view SDS (use_sds path, dge_guidance.py:548-566 +
        compute_grad_sds :376-475): noise at t, one pivot/epipolar-attended
        eps prediction, grad = w (eps - noise), returned with the
        reference's loss form 0.5 * ||latents - (latents - grad)||^2 / B."""
        cfg = self.cfg
        models = self.models
        b, h, w, _ = rgb.shape
        rh, rw = P.resize_to_64_multiple(h, w, cfg.resize_target)
        if (rh, rw) != (h, w):
            rgb = jax.image.resize(rgb, (b, rh, rw, 3), "bilinear")
            cond_rgb = jax.image.resize(cond_rgb, (b, rh, rw, 3), "bilinear")
        rng, r_enc, r_noise, r_piv = jax.random.split(rng, 4)
        latents = P.encode_images(models, rgb, r_enc)
        cond_latents = P.encode_cond_images(models, cond_rgb)
        emb_pos, emb_neg = text_emb_pos, text_emb_neg
        cond_img, _, cond_zero = jnp.split(cond_latents, 3, axis=0)

        def triple_for(idx):
            te = jnp.concatenate([emb_pos[idx], emb_neg[idx], emb_neg[idx]], 0)
            cl = jnp.concatenate(
                [cond_img[idx], cond_img[idx], cond_zero[idx]], 0
            )
            return te, cl

        t = int(t if t is not None else self.max_step - 1)
        noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
        noisy = ddim.add_noise(
            models.schedule, latents, noise, jnp.full((b,), t)
        )
        cbs = cfg.camera_batch_size
        n_batches = max(b // cbs, 1)
        eps_final = self._predict_eps_multiview(
            noisy, t, cams, triple_for, b, cbs, n_batches,
            latents.shape[1], latents.shape[2], r_piv,
        )
        w_t = 1.0 - models.schedule.alphas_cumprod[t]
        grad = w_t * (eps_final - noise)
        grad = jnp.nan_to_num(grad)
        target = jax.lax.stop_gradient(latents - grad)
        loss_sds = 0.5 * jnp.sum((latents - target) ** 2) / b
        return {"grad": grad, "loss_sds": loss_sds,
                "grad_norm": jnp.linalg.norm(grad),
                "latents": latents, "target": target}

    def compute_grad_sds(
        self,
        text_emb: jnp.ndarray,
        latents: jnp.ndarray,
        cond_latents: jnp.ndarray,
        t: int,
        rng: jax.Array,
    ) -> jnp.ndarray:
        """SDS gradient w = (1 - alpha_bar_t) (compute_grad_sds,
        dge_guidance.py:376-475; plain single-pass variant)."""
        models = self.models
        cfg = self.cfg
        b = latents.shape[0]
        noise = jax.random.normal(rng, latents.shape, latents.dtype)
        noisy = ddim.add_noise(models.schedule, latents, noise, jnp.full((b,), t))
        cond_img, _, cond_zero = jnp.split(cond_latents, 3, axis=0)
        cl = jnp.concatenate([cond_img, cond_img, cond_zero], axis=0)
        inp = jnp.concatenate([P.triple(noisy), cl], axis=-1)
        eps = self._plain_fn()(
            models.unet_params, inp, jnp.asarray(t), text_emb
        )
        e_t, e_i, e_u = jnp.split(eps, 3, axis=0)
        eps_final = P.cfg_combine(
            e_t, e_i, e_u, cfg.guidance_scale, cfg.condition_scale
        )
        w = 1.0 - models.schedule.alphas_cumprod[t]
        return w * (eps_final - noise)
