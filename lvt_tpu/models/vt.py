"""Subscale Video Transformer, TPU-native
(reference: vidgen/modeling/autoregressive/videotransformer.py,
meta_arch/vt.py).

Architecture parity:
* VTEncoder (videotransformer.py:11-59): context one-hot Conv3d rebuilt as a
  fused embedding gather (ops.conv.subscale_context_encode), + slice-index
  embedding, optional class embedding concat, 1x1x1 projector, stack of
  unmasked BlockLocalAttention. (The reference creates but never calls a
  positional encoder here — we match the *behavior*: no posenc.)
* VTDecoder (:62-101): summed per-channel embeddings, causal MaskedConv3d,
  3-D sinusoidal posenc, projected context add, masked BlockLocalAttention.
* ChannelPredictor (:104-187): within-pixel autoregression over the nc
  codebook channels with U_k MLPs and shared / per-channel / embedding-tied
  output heads.

Whole-video passes (teacher-forced logits, sampling) are lax.scan's over the
precomputed SubscalePlan gather maps — no data-dependent shapes, one compile.

Layouts: codes (b, nc, T, H, W) int32 at the API boundary (matches reference
latent .npy), activations channels-last (b, t, h, w, d) on device.
"""

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import subscale as ss
from ..ops.attention import (BlockAttnParams, _layer_norm,
                             block_local_attention, init_block_attn)
from ..ops.conv import masked_conv3d, subscale_context_encode
from ..ops.embedding import take_rows
from ..ops.posenc import add_positional_encoding
from ..utils.registry import Registry

AUTOREGRESSIVE_REGISTRY = Registry("AUTOREGRESSIVE")


class VTConfig(NamedTuple):
    nc: int
    nv: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    d: int
    da: int
    de: int
    blocks_e: Tuple[Tuple[int, int, int], ...]
    n_head_e: Tuple[int, ...]
    blocks_d: Tuple[Tuple[int, int, int], ...]
    n_head_d: Tuple[int, ...]
    n_prime: int
    pad_value: int
    share_p: bool
    share_embeddings: bool
    class_num: int

    @staticmethod
    def from_cfg(cfg) -> "VTConfig":
        v = cfg.MODEL.AUTOREGRESSIVE.VT
        return VTConfig(
            nc=v.NC, nv=v.NV, kernel=tuple(v.KERNEL), stride=tuple(v.STRIDE),
            d=v.D, da=v.DA, de=v.DE,
            blocks_e=tuple(tuple(b) for b in v.BLOCKS_E), n_head_e=tuple(v.N_HEAD_E),
            blocks_d=tuple(tuple(b) for b in v.BLOCKS_D), n_head_d=tuple(v.N_HEAD_D),
            n_prime=v.N_PRIME, pad_value=v.PAD_VALUE,
            share_p=v.SHARE_P, share_embeddings=v.SHARE_EMBEDDINGS,
            class_num=v.CLASS_NUM,
        )


def _xavier_uniform(key, shape, fan_in, fan_out):
    lim = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, jnp.float32, -lim, lim)


# --------------------------------------------------------------------------
# Parameter init
# --------------------------------------------------------------------------

def init_vt_params(key, c: VTConfig) -> Dict[str, Any]:
    st, sh, sw = c.stride
    kt, kh, kw = c.kernel
    S = st * sh * sw
    keys = iter(jax.random.split(key, 64))

    # encoder
    ctx_fan_in = c.nc * c.nv * kt * kh * kw
    enc = {
        # embedding-form conv weight; fan as the dense (de, nc*nv, k) conv
        "ctx_table": _xavier_uniform(next(keys), (c.nc, kt, kh, kw, c.nv, c.de),
                                     ctx_fan_in, c.de * kt * kh * kw),
        "ctx_bias": jnp.zeros((c.de,)),
        "slice_embedding": jax.random.normal(next(keys), (S, c.de)),
        "projector": _xavier_uniform(
            next(keys),
            ((2 * c.de if c.class_num > 0 else c.de), c.d),
            (2 * c.de if c.class_num > 0 else c.de), c.d),
        "layers": [init_block_attn(next(keys), b, n, c.d, c.da)
                   for b, n in zip(c.blocks_e, c.n_head_e)],
    }
    if c.class_num > 0:
        enc["class_embedding"] = jax.random.normal(next(keys), (c.class_num, c.de))

    # decoder
    dec = {
        "ch_embed": jax.random.normal(next(keys), (c.nc, c.nv, c.de)),
        "conv_w": _xavier_uniform(next(keys), (3, 3, 3, c.de, c.d),
                                  c.de * 27, c.d * 27),
        "conv_b": jnp.zeros((c.d,)),
        "projector": _xavier_uniform(next(keys), (c.d, c.d), c.d, c.d),
        "layers": [init_block_attn(next(keys), b, n, c.d, c.da)
                   for b, n in zip(c.blocks_d, c.n_head_d)],
    }

    # channel predictor
    pred: Dict[str, Any] = {
        "ln_scale": jnp.ones((c.d,)),
        "ln_bias": jnp.zeros((c.d,)),
        "U_w": [_xavier_uniform(next(keys), (c.d + k * c.nv, c.d),
                                c.d + k * c.nv, c.d) for k in range(c.nc)],
        "U_b": [jnp.zeros((c.d,)) for _ in range(c.nc)],
    }
    if c.share_p:
        assert not c.share_embeddings, "share_p and share_embeddings conflict"
        pred["P_w"] = _xavier_uniform(next(keys), (c.d, c.nv), c.d, c.nv)
        pred["P_b"] = jnp.zeros((c.nv,))
    elif c.share_embeddings:
        pred["P_w"] = _xavier_uniform(next(keys), (c.d, c.de), c.d, c.de)
        pred["P_b"] = jnp.zeros((c.de,))
    else:
        pred["P_w"] = [_xavier_uniform(next(keys), (c.d, c.nv), c.d, c.nv)
                       for _ in range(c.nc)]
        pred["P_b"] = [jnp.zeros((c.nv,)) for _ in range(c.nc)]

    return {"encoder": enc, "decoder": dec, "predictor": pred}


# --------------------------------------------------------------------------
# Forward passes
# --------------------------------------------------------------------------

# _layer_norm: imported from ops.attention (one shared definition; a second
# private copy once drifted to bf16 stats and desynced the XLA/fused paths)


def _checkpoint_policy(remat):
    """remat: False | True (save nothing) | "dots" (save matmul outputs) |
    "qkv" (save only the checkpoint_name-tagged q/k/v projections — skips
    the LN+QKV replay the attention vjp otherwise forces, without stashing
    the fp32 score matrices that make "dots" a net loss)."""
    if remat == "dots":
        return jax.checkpoint_policies.checkpoint_dots
    if remat == "qkv":
        return jax.checkpoint_policies.save_only_these_names("qkv")
    return None


def _apply_attn_stack(x, layers, blocks, masked, *, use_pallas=None,
                      remat=False, fused=False):
    """Run a stack of BlockLocalAttention layers.

    When every layer shares one block size (true for all shipped configs),
    the per-layer params are stacked and driven by ONE lax.scan — ~L x
    smaller HLO, ~L x faster compiles than Python unrolling; heterogeneous
    stacks fall back to the unrolled loop.

    fused=True (TPU.FUSED_LAYER) runs each layer as ONE Pallas kernel
    (ops/fused_layer.py) on TPU when the geometry qualifies; the fused
    layer recomputes through the XLA vjp in its backward, so it is its own
    remat unit and skips the jax.checkpoint wrapper.
    """
    homogeneous = (len(set(blocks)) == 1 and len(layers) > 1
                   and len({tuple(l.wq.shape) for l in layers}) == 1)

    def one(xx, pp, blk):
        return block_local_attention(xx, pp, blk, masked=masked,
                                     use_pallas=use_pallas)

    if homogeneous:
        from ..ops.attention import (
            causal_mask,
            ffn_tokens,
            merge_blocks,
            mha_tokens,
            relative_bias,
            split_blocks,
        )

        on_tpu = (use_pallas if use_pallas is not None
                  else jax.default_backend() == "tpu")
        use_fused = fused and on_tpu
        if use_fused:
            from ..ops.fused_layer import fused_block_layer, fused_layer_supported

            use_fused = fused_layer_supported(layers, blocks)

        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
        blk = blocks[0]
        t, h, w = blk
        mask = causal_mask(t * h * w) if masked else None
        # split/merge (two full-activation transposes) hoisted OUT of the
        # layer scan: every layer shares the block geometry, so the token
        # form round-trips once instead of per layer
        tokens, geom = split_blocks(x, blk)

        def body(tok, pp):
            if use_fused:
                bias = relative_bias(pp.dt_bank, pp.dh_bank, pp.dw_bank, blk)
                return fused_block_layer(tok, pp, bias, masked), None

            def layer(tok, pp):
                bias = relative_bias(pp.dt_bank, pp.dh_bank, pp.dw_bank, blk)
                tok = mha_tokens(tok, pp, bias, mask, use_pallas=use_pallas)
                return ffn_tokens(tok, pp)

            f = (jax.checkpoint(layer, policy=_checkpoint_policy(remat))
                 if remat else layer)
            return f(tok, pp), None

        tokens, _ = jax.lax.scan(body, tokens, stacked)
        return merge_blocks(tokens, geom)

    for p, blk in zip(layers, blocks):
        f = (jax.checkpoint(one, static_argnums=(2,),
                            policy=_checkpoint_policy(remat))
             if remat else one)
        x = f(x, p, blk)
    return x


def vt_encode(params, c: VTConfig, ctx, slice_idx, class_idx=None, *,
              use_pallas=None, remat=False, fused=False):
    """Context branch. ctx: (b, nc, T', H', W') codes with pad_value at
    invisible positions; slice_idx: (b,). Returns zl (b, t, h, w, d)."""
    enc = params["encoder"]
    # pad_value (-1) rows contribute zero, replicating the one-hot zeroing
    # (videotransformer.py:41-48)
    x = subscale_context_encode(ctx, enc["ctx_table"], enc["ctx_bias"],
                                c.stride, c.nv)
    x = x + enc["slice_embedding"][slice_idx][:, None, None, None, :]
    if c.class_num > 0 and class_idx is not None:
        cls = enc["class_embedding"][class_idx][:, None, None, None, :]
        cls = jnp.broadcast_to(cls, x.shape)
        x = jnp.concatenate([x, cls], axis=-1)
    x = x @ enc["projector"]
    return _apply_attn_stack(x, enc["layers"], c.blocks_e, False,
                             use_pallas=use_pallas, remat=remat, fused=fused)


def vt_decode(params, c: VTConfig, slice_codes, zl, *, use_pallas=None,
              remat=False, fused=False):
    """Slice branch. slice_codes: (b, nc, t, h, w) int; zl: (b, t, h, w, d).
    Returns yl (b, t, h, w, d)."""
    dec = params["decoder"]
    # embed_sum (videotransformer.py:80-89)
    emb = jnp.zeros(slice_codes.shape[:1] + slice_codes.shape[2:] + (c.de,),
                    dec["ch_embed"].dtype)
    for k in range(c.nc):
        # take_rows: backward as one-hot matmul (16k+ lookups into nv rows —
        # the natural scatter-add collides on every row and serializes)
        emb = emb + take_rows(dec["ch_embed"][k], slice_codes[:, k])
    x = masked_conv3d(emb, dec["conv_w"], dec["conv_b"])
    x = add_positional_encoding(x)
    x = x + zl @ dec["projector"]
    return _apply_attn_stack(x, dec["layers"], c.blocks_d, True,
                             use_pallas=use_pallas, remat=remat, fused=fused)


def _predictor_head(pred, c: VTConfig, k: int, u, dec_params):
    """relu(u) -> nv logits via shared / per-channel / tied head
    (videotransformer.py:150-158)."""
    r = jax.nn.relu(u)
    if c.share_p:
        return r @ pred["P_w"] + pred["P_b"]
    if c.share_embeddings:
        e = r @ pred["P_w"] + pred["P_b"]  # (..., de)
        return e @ dec_params["ch_embed"][k].T  # tied to decoder embeddings
    return r @ pred["P_w"][k] + pred["P_b"][k]


def _predictor_u(pred, c: VTConfig, k: int, y, codes):
    """u_k = U_k([y; onehot(codes_<k)]) computed without the one-hot: the
    one-hot block of U_k is a row gather (codes: (..., nc) int; only
    channels < k are read). Exact rewrite of videotransformer.py:149."""
    w = pred["U_w"][k]  # (d + k*nv, d)
    d = y.shape[-1]
    nv = c.nv
    u = y @ w[:d] + pred["U_b"][k]
    for j in range(k):
        u = u + take_rows(w[d + j * nv : d + (j + 1) * nv], codes[..., j])
    return u


def vt_logits(params, c: VTConfig, ctx, slice_codes, slice_idx, class_idx=None,
              *, use_pallas=None, remat=False, fused=False):
    """Teacher-forced logits for all positions/channels.

    Returns (b, t, h, w, nc, nv) float32.
    """
    zl = vt_encode(params, c, ctx, slice_idx, class_idx,
                   use_pallas=use_pallas, remat=remat, fused=fused)
    yl = vt_decode(params, c, slice_codes, zl, use_pallas=use_pallas,
                   remat=remat, fused=fused)
    pred = params["predictor"]
    y = _layer_norm(yl, pred["ln_scale"], pred["ln_bias"])

    codes = jnp.moveaxis(slice_codes, 1, -1)  # (b, t, h, w, nc)
    outs = []
    for k in range(c.nc):
        u = _predictor_u(pred, c, k, y, codes)
        outs.append(_predictor_head(pred, c, k, u, params["decoder"]))
    return jnp.stack(outs, axis=-2)  # (b, t, h, w, nc, nv)


def vt_sample_pixel_channels(params, c: VTConfig, y_pix, key, temp: float,
                             greedy: bool = False):
    """Sample the nc channel codes of one pixel autoregressively
    (videotransformer.py:161-185). y_pix: (b, d) — already layer-normed
    decoder output at the pixel. Returns (b, nc) int32.

    The one-hot-of-previous-channels matmul is computed as exact row gathers
    of U_k's lower block (see _predictor_u) — the hot sampling path reads
    nc-1 rows instead of streaming k*nv*d weights per channel.
    """
    pred = params["predictor"]
    b = y_pix.shape[0]
    codes = jnp.zeros((b, c.nc), jnp.int32)
    for k in range(c.nc):
        u = _predictor_u(pred, c, k, y_pix, codes)
        logits = _predictor_head(pred, c, k, u, params["decoder"])
        logits = logits.astype(jnp.float32)
        if greedy:
            sk = jnp.argmax(logits, axis=-1)
        else:
            key, sub = jax.random.split(key)
            sk = jax.random.categorical(sub, logits / temp, axis=-1)
        codes = codes.at[:, k].set(sk.astype(jnp.int32))
    return codes


# --------------------------------------------------------------------------
# Meta-arch: whole-video operations over the SubscalePlan
# --------------------------------------------------------------------------

class VideoTransformer:
    """Meta-arch wrapper (reference VideoTransformerModel, vt.py:22-328)."""

    def __init__(self, cfg, T: int = 16, H: int = 16, W: int = 16):
        self.cfg = cfg
        self.c = VTConfig.from_cfg(cfg)
        self.T, self.H, self.W = T, H, W
        self._plans = {}
        self.plan = self._plan_for(T, H, W)  # default geometry
        self.ignore_index = cfg.MODEL.IGNORE_INDEX
        self.use_pallas: Optional[bool] = None
        # False | True (full remat) | "dots" (policy, see TPU.REMAT_POLICY)
        policy = getattr(cfg.TPU, "REMAT_POLICY", "")
        if policy not in ("", "dots", "qkv"):
            raise ValueError(
                f"TPU.REMAT_POLICY must be '' (full remat), 'dots' or "
                f"'qkv', got {policy!r}")
        self.remat = (policy or True) if cfg.TPU.REMAT else False
        # whole-layer Pallas fusion for the teacher-forced stacks (TPU only,
        # geometry-gated in _apply_attn_stack; see ops/fused_layer.py)
        self.fused = bool(getattr(cfg.TPU, "FUSED_LAYER", False))

    def _plan_for(self, T: int, H: int, W: int):
        """Subscale gather plan for one latent geometry. Params are
        geometry-independent, so one model instance serves any (T, H, W)
        the data presents — plans are built lazily at trace time from the
        input shapes (the constructor's T/H/W are just the default)."""
        key = (T, H, W)
        if key not in self._plans:
            self._plans[key] = ss.build_plan(*self.c.stride, T, H, W,
                                             *self.c.kernel)
        return self._plans[key]

    def init(self, key):
        """Returns (params, model_state); the VT keeps no mutable state."""
        return {"netG": init_vt_params(key, self.c)}, {}

    # -- training ------------------------------------------------------------
    def prepare_slices(self, video, slice_idx):
        """On-device slice preparation (replaces the reference's CPU
        dataloader-worker prep, data/dataset_mapper.py:113-149).

        video: (b, nc, T, H, W) codes; slice_idx: (b,) int32.
        Returns (context, slice_codes, ignore_mask).
        """
        b, nc, T, H, W = video.shape
        plan = self._plan_for(T, H, W)
        vflat = video.reshape(b, nc, -1)
        sl_maps = jnp.asarray(plan.slice_src)  # (S, t, h, w)

        def per_sample(vf, sidx):
            sl = ss.gather_slice(vf, sl_maps[sidx])
            frame = sl_maps[sidx] // (H * W)  # video frame per slice pos
            ignore = frame < self.c.n_prime
            return sl, ignore

        sl, ignore = jax.vmap(per_sample)(vflat, slice_idx)
        ctx = self._gather_ctx(plan, vflat, slice_idx)
        return ctx, sl, ignore

    def _gather_ctx(self, plan, vflat, s):
        """Context codes for slice index s (scalar for scan bodies, (b,)
        vector for per-sample training prep). Uses the frame-row fast path
        when the plan's context map is frame-uniform (see
        SubscalePlan.ctx_frame_src) — the generic per-element gather is
        latency-bound on TPU (~1.5 ms/step on DSFVT b64)."""
        b, nc = vflat.shape[:2]
        T, H, W = plan.T, plan.H, plan.W
        if plan.ctx_frame_src is not None:
            fmap = jnp.asarray(plan.ctx_frame_src)[s]  # (T',) or (b, T')
            v4 = vflat.reshape(b, nc, T, H * W)
            ctx = ss.gather_context_frames(v4, fmap, self.c.pad_value)
            return ctx.reshape(b, nc, fmap.shape[-1], H, W)
        ctx_maps = jnp.asarray(plan.ctx_src)
        if jnp.ndim(s) == 0:
            return ss.gather_context(vflat, ctx_maps[s], self.c.pad_value)
        return jax.vmap(lambda vf, si: ss.gather_context(
            vf, ctx_maps[si], self.c.pad_value))(vflat, s)

    def sample_train_slice_idx(self, key, batch: int, T: Optional[int] = None):
        """Random (a,b,c) per sample. For the single-frame geometry (t==1,
        sh==sw==1) the reference draws a in [n_prime, st-1]
        (dataset_mapper.py:124-125) so fully-primed slices are never trained."""
        st, sh, sw = self.c.stride
        t = (self.T if T is None else T) // st
        if t == 1 and sh == 1 and sw == 1:
            lo = self.c.n_prime
        else:
            lo = 0
        return jax.random.randint(key, (batch,), lo, st * sh * sw, jnp.int32)

    def loss(self, params, batch, rng, *, axis_name=None, slice_idx=None):
        """CE over one random slice per video (reference
        compute_supervised_loss, vt.py:301-314 + mapper slice prep).

        batch: {"video": (b, nc, T, H, W) int32, optional "class": (b,)}.
        slice_idx: optional fixed (b,) slice indices — bypasses the random
        draw for deterministic parity tests (the rest of the composed path,
        on-device slice prep -> logits -> masked CE, is unchanged).
        """
        video = batch["video"]
        b = video.shape[0]
        if slice_idx is None:
            k_idx, _ = jax.random.split(rng)
            slice_idx = self.sample_train_slice_idx(k_idx, b, T=video.shape[2])
        ctx, slice_codes, ignore = self.prepare_slices(video, slice_idx)
        class_idx = batch.get("class") if self.c.class_num > 0 else None

        logits = vt_logits(params["netG"], self.c, ctx, slice_codes, slice_idx,
                           class_idx, use_pallas=self.use_pallas,
                           remat=self.remat, fused=self.fused)  # (b, t, h, w, nc, nv)
        targets = jnp.moveaxis(slice_codes, 1, -1)  # (b, t, h, w, nc)
        valid = ~ignore[..., None]  # (b, t, h, w, 1) -> broadcast over nc

        # CE as logsumexp - one-hot dot: take_along_axis's gather costs ~1 ms
        # and its vjp is a scatter into the full logits buffer (~1.5 ms more);
        # the one-hot contraction fuses into elementwise passes with a clean
        # (softmax - onehot) backward, no gather/scatter at all
        logits32 = logits.astype(jnp.float32)
        lse = jax.nn.logsumexp(logits32, axis=-1)
        true_logit = jnp.sum(
            logits32 * jax.nn.one_hot(targets, self.c.nv, dtype=jnp.float32),
            axis=-1)
        ce = lse - true_logit
        valid_f = jnp.broadcast_to(valid, ce.shape).astype(jnp.float32)
        # per-channel mean over non-ignored, then mean over channels
        # (vt.py:309-312: sum of per-channel F.cross_entropy / nc)
        num = jnp.sum(ce * valid_f, axis=(0, 1, 2, 3))
        den = jnp.maximum(jnp.sum(valid_f, axis=(0, 1, 2, 3)), 1.0)
        loss = jnp.mean(num / den)
        if axis_name is not None:
            loss = jax.lax.pmean(loss, axis_name)
        return loss, {"loss_cross_entropy": loss}

    def train_loss(self, params, model_state, batch, rng, *, axis_name=None):
        """Uniform trainer interface; the VT has no mutable model state."""
        loss, metrics = self.loss(params, batch, rng, axis_name=axis_name)
        return loss, (metrics, model_state)

    def visualize_training(self, params, state, batch):
        """Sample one slice given its context and show gt vs sampled code
        maps as grayscale grids (reference visualize_training + sample_slice,
        vt.py:139-180)."""
        from ..utils.image import array2im
        from .vt_incremental import sample_slice_incremental

        video = jnp.asarray(batch["video"][:1])
        plan = self._plan_for(*video.shape[2:])
        s = min(self.c.n_prime, plan.num_slices - 1)
        slice_idx = jnp.asarray([s], jnp.int32)
        ctx, gt_slice, _ = self.prepare_slices(video, slice_idx)
        # class-conditional models need the class embedding concat here too
        # (same batch convention as loss(); without it the encoder projector
        # sees de channels where it was built for 2*de)
        class_idx = batch.get("class") if self.c.class_num > 0 else None
        if class_idx is not None:
            class_idx = jnp.asarray(class_idx[:1])
        zl = vt_encode(params["netG"], self.c, ctx, slice_idx, class_idx,
                       use_pallas=self.use_pallas)
        t, h, w = plan.slice_shape
        primed = jnp.zeros((t * h * w,), bool)
        sampled, _ = sample_slice_incremental(
            params["netG"], self.c, (t, h, w), zl,
            jnp.zeros_like(gt_slice), jax.random.key(0), primed, 0.9)

        def to_img(sl):  # (1, nc, t, h, w) codes -> (C, H, W) uint8 grid
            x = np.asarray(sl[0], np.float32) / self.c.nv  # (nc, t, h, w)
            x = x.transpose(1, 0, 2, 3)  # (t, nc, h, w)
            img = array2im(x, normalize=False, tile=True)
            if img.ndim == 2:
                img = img[:, :, None]
            return img.transpose(2, 0, 1)

        return {"gt_slice": to_img(gt_slice), "sampled_slice": to_img(sampled)}

    # -- evaluation ----------------------------------------------------------
    def logits_for_entire_video(self, params, video, class_idx=None):
        """Teacher-forced logits for all S slices, scattered to full-video
        layout (reference calculate_logits_for_entire_video, vt.py:230-282).

        video: (b, nc, T, H, W) -> logits (b, T, H, W, nc, nv). (The caller
        applies its own prime-frame ignore mask; see engine/defaults.py.)
        """
        b, nc, T, H, W = video.shape
        plan = self._plan_for(T, H, W)
        vflat = video.reshape(b, nc, -1)
        sl_maps = jnp.asarray(plan.slice_src)
        S = plan.num_slices
        THW = T * H * W

        def body(carry, s):
            logits_flat = carry
            ctx = self._gather_ctx(plan, vflat, s)
            sl = ss.gather_slice(vflat, sl_maps[s])
            sidx = jnp.full((b,), s, jnp.int32)
            lg = vt_logits(params["netG"], self.c, ctx, sl, sidx, class_idx,
                           use_pallas=self.use_pallas,
                           fused=self.fused)  # (b, t, h, w, nc, nv)
            lg_flat = lg.reshape(b, -1, nc, self.c.nv)
            logits_flat = logits_flat.at[:, sl_maps[s].reshape(-1)].set(lg_flat)
            return logits_flat, None

        init = jnp.zeros((b, THW, nc, self.c.nv), jnp.float32)
        logits_flat, _ = jax.lax.scan(body, init, jnp.arange(S))
        return logits_flat.reshape(b, T, H, W, nc, self.c.nv)

    def logits_for_entire_video_incremental(self, params, video,
                                            class_idx=None, *,
                                            kv_cache_dtype: str = "native",
                                            kv_seg_size: int = 0):
        """Teacher-forced logits computed THROUGH the KV-cached incremental
        decoder — same (b, T, H, W, nc, nv) contract as
        logits_for_entire_video. With kv_cache_dtype="native" the result
        matches the XLA teacher-forced path (same arithmetic, cached form);
        with "int8"/"int4" it measures exactly the logit error the
        quantized cache injects at full scale (VERDICT r3 #2 quality
        accounting). fp32 output is b x 33.5 MB at DSFVT geometry — keep
        batch modest or reduce on device before pulling to host.
        """
        from .vt_incremental import sample_slice_incremental

        b, nc, T, H, W = video.shape
        plan = self._plan_for(T, H, W)
        t, h, w = plan.slice_shape
        vflat = video.reshape(b, nc, -1)
        sl_maps = jnp.asarray(plan.slice_src)
        THW = T * H * W

        logits_flat = jnp.zeros((b, THW, nc, self.c.nv), jnp.float32)
        # python loop over slices (not lax.scan): each slice runs the same
        # compiled segment scans; S is small and static
        for s in range(plan.num_slices):
            ctx = self._gather_ctx(plan, vflat, s)
            sl = ss.gather_slice(vflat, sl_maps[s])
            sidx = jnp.full((b,), s, jnp.int32)
            zl = vt_encode(params["netG"], self.c, ctx, sidx, class_idx,
                           use_pallas=self.use_pallas)
            _, _, lg = sample_slice_incremental(
                params["netG"], self.c, plan.slice_shape, zl, sl,
                jax.random.key(0), jnp.ones((t * h * w,), bool), 1.0,
                kv_dtype=kv_cache_dtype, seg_size=kv_seg_size,
                teacher_logits=True)  # (b, thw, nc, nv)
            logits_flat = logits_flat.at[:, sl_maps[s].reshape(-1)].set(lg)
        return logits_flat.reshape(b, T, H, W, nc, self.c.nv)

    # -- sampling ------------------------------------------------------------
    def sample_video(self, params, video, key, *, temp: float = 1.0,
                     n_prime: Optional[int] = None, class_idx=None,
                     incremental: bool = True, greedy: bool = False,
                     kv_cache_dtype: str = "native", kv_seg_size: int = 0,
                     weight_dtype: str = "native", mm_dtype: str = "native",
                     attn_impl: str = "xla", streams: int = 1):
        """AR-sample all non-primed positions (reference sample_video,
        vt.py:82-136) as a scan over slices x pixels, jit-compatible.

        video: (b, nc, T, H, W) with primed frames filled, others arbitrary.
        incremental=True uses the KV-cached decoder (exact, ~thw x less
        compute per pixel); False re-runs the full decoder per pixel — the
        reference's formulation, kept as the verification/baseline path.
        """
        if not incremental:
            # the full-recompute path has no KV cache: refuse compute-path
            # knobs it would silently ignore (kv_cache_dtype/kv_seg_size
            # describe the cache and are simply meaningless here — callers
            # like bench.py pass their defaults through)
            for name, val, default in (("weight_dtype", weight_dtype, "native"),
                                       ("mm_dtype", mm_dtype, "native"),
                                       ("attn_impl", attn_impl, "xla"),
                                       ("streams", streams, 1)):
                if val != default:
                    raise ValueError(
                        f"sample_video(incremental=False) ignores {name}; "
                        f"got {name}={val!r} — an A/B comparison against "
                        f"the baseline would silently compare the wrong "
                        f"configuration")
        if n_prime is None:
            n_prime = self.c.n_prime
        c = self.c
        b, nc, T, H, W = video.shape
        plan = self._plan_for(T, H, W)
        t, h, w = plan.slice_shape
        thw = t * h * w
        vflat = video.reshape(b, nc, -1)
        sl_maps = jnp.asarray(plan.slice_src)
        S = plan.num_slices

        def sample_slice(carry, s):
            vf, key = carry
            sl = ss.gather_slice(vf, sl_maps[s])  # (b, nc, t, h, w)
            frame = sl_maps[s].reshape(-1) // (H * W)
            primed = frame < n_prime  # (thw,)

            def run(operand):
                sl, key = operand
                ctx = self._gather_ctx(plan, vf, s)
                sidx = jnp.full((b,), s, jnp.int32)
                zl = vt_encode(params["netG"], c, ctx, sidx, class_idx,
                               use_pallas=self.use_pallas)
                if incremental:
                    from .vt_incremental import sample_slice_incremental

                    return sample_slice_incremental(
                        params["netG"], c, plan.slice_shape, zl, sl, key,
                        primed, temp, greedy=greedy, kv_dtype=kv_cache_dtype,
                        seg_size=kv_seg_size, weight_dtype=weight_dtype,
                        mm_dtype=mm_dtype, attn_impl=attn_impl,
                        streams=streams)
                return self._sample_slice_pixels(params, zl, sl, key, primed,
                                                 temp, greedy=greedy)

            # fully-primed slices (e.g. the first n_prime DSFVT frames) are
            # skipped wholesale — the reference skips per-pixel (vt.py:126-127)
            sl, key = jax.lax.cond(jnp.all(primed), lambda op: op, run, (sl, key))
            vf = ss.scatter_slice(vf, sl_maps[s], sl)
            return (vf, key), None

        (vflat, _), _ = jax.lax.scan(sample_slice, (vflat, key), jnp.arange(S))
        return vflat.reshape(b, nc, T, H, W)

    def _sample_slice_pixels(self, params, zl, sl, key, primed, temp,
                             greedy=False):
        """Scan raster positions of one slice, sampling each pixel's nc
        channels with the full decoder context (exact AR factorization)."""
        c = self.c
        b, nc, t, h, w = sl.shape
        thw = t * h * w

        def sample_pixel(carry_p, p):
            sl_codes, key = carry_p
            yl = vt_decode(params["netG"], c, sl_codes, zl,
                           use_pallas=self.use_pallas)
            pred = params["netG"]["predictor"]
            y_flat = yl.reshape(b, thw, c.d)
            y_pix = _layer_norm(y_flat[:, p], pred["ln_scale"], pred["ln_bias"])
            key, sub = jax.random.split(key)
            new_codes = vt_sample_pixel_channels(params["netG"], c, y_pix,
                                                 sub, temp, greedy=greedy)  # (b, nc)
            sl_flat = sl_codes.reshape(b, nc, thw)
            old = sl_flat[:, :, p]
            val = jnp.where(primed[p], old, new_codes)
            sl_flat = sl_flat.at[:, :, p].set(val)
            return (sl_flat.reshape(b, nc, t, h, w), key), None

        (sl, key), _ = jax.lax.scan(sample_pixel, (sl, key), jnp.arange(thw))
        return sl, key


@AUTOREGRESSIVE_REGISTRY.register()
def VideoTransformerModel(cfg, **kwargs):
    return VideoTransformer(cfg, **kwargs)


def build_autoregressive(cfg, **kwargs):
    # the reference dispatches on MODEL.AUTOREGRESSIVE.NAME ("VideoTransformer")
    # inside the VideoTransformerModel meta-arch; we expose the same surface
    name = cfg.MODEL.AUTOREGRESSIVE.NAME
    if name == "VideoTransformer":
        return VideoTransformer(cfg, **kwargs)
    raise KeyError(f"Unknown autoregressive model {name}")
