"""Incremental (KV-cached) subscale decoder for AR sampling.

The reference re-runs the FULL decoder stack over the whole slice for every
pixel (videotransformer.py:243 — O(thw) decoder work per pixel, O(thw^2)
per slice). Because every decoder component is strictly causal in raster
order — the causal conv's unmasked taps all read positions < p, masked
block-local attention attends to positions <= p, FFN/LN are per-token —
position p's activations never change once computed. So we cache them:

* ``emb``      — summed channel embeddings of the *final* codes (primed or
                 sampled), consumed by the causal conv of later pixels;
* per layer    — K/V caches (b, na, thw, da) appended at p before attending
                 (p attends to itself, matching the diagonal-keeping mask);
* per slice    — zl projection and (bias + block-structure) logit masks are
                 precomputed once.

Per-pixel cost drops from O(thw * layers * d^2) to O(layers * d^2): ~250x
less compute for DSFVT. Exactness is tested against the teacher-forced
decoder (test_vt_incremental.py).
"""

from functools import lru_cache
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import BlockAttnParams, relative_bias
from ..ops.cache_attention import (blockdiag_expand,
                                   decode_attention_i8_live_pallas,
                                   decode_attention_i8_pallas,
                                   decode_attention_pallas)
from ..ops.fused_layer import _wqkv_flat
from ..ops.posenc import _signal_np
from ..ops.quant_matmul import matmul_i8w_pallas, quantize_rows_i8
from .vt import (VTConfig, _layer_norm, _predictor_head, _predictor_u,
                 vt_sample_pixel_channels)


# --------------------------------------------------------------------------
# Static tables
# --------------------------------------------------------------------------

@lru_cache(maxsize=16)
def conv_tap_table(slice_shape: Tuple[int, int, int],
                   kernel: Tuple[int, int, int] = (3, 3, 3)):
    """For each flat raster position p of the (t, h, w) slice grid, the flat
    indices read by the causal masked conv (ops.conv.masked_conv3d semantics:
    pad (kt-1,0)/(kh-1,0)/centered w; taps (kt-1,kh-1,>=kw//2) masked).

    Returns (nbr (thw, K'), tap_ids (K',)) with nbr = -1 for out-of-bounds;
    K' = number of unmasked taps; tap_ids index into the flattened kernel.
    """
    t, h, w = slice_shape
    kt, kh, kw = kernel
    taps = []
    for kti in range(kt):
        for khi in range(kh):
            for kwi in range(kw):
                dt = kti - (kt - 1)
                dh = khi - (kh - 1)
                dw = kwi - kw // 2
                if dt == 0 and dh == 0 and dw >= 0:
                    continue  # causally masked taps
                taps.append((kti * kh * kw + khi * kw + kwi, dt, dh, dw))

    thw = t * h * w
    nbr = np.full((thw, len(taps)), -1, np.int32)
    for p in range(thw):
        ti, rem = divmod(p, h * w)
        hi, wi = divmod(rem, w)
        for j, (_, dt, dh, dw) in enumerate(taps):
            a, b, c = ti + dt, hi + dh, wi + dw
            if 0 <= a < t and 0 <= b < h and 0 <= c < w:
                nbr[p, j] = (a * h + b) * w + c
    tap_ids = np.asarray([tp[0] for tp in taps], np.int32)
    return nbr, tap_ids


@lru_cache(maxsize=16)
def block_structure(slice_shape: Tuple[int, int, int],
                    block: Tuple[int, int, int]):
    """(block_id (thw,), rel_idx (thw,)): which attention block each raster
    position belongs to and its index within the block (contiguous-tile
    partition, ops.attention.split_blocks order)."""
    t, h, w = slice_shape
    bt, bh, bw = block
    thw = t * h * w
    block_id = np.empty(thw, np.int32)
    rel_idx = np.empty(thw, np.int32)
    nbh, nbw = h // bh, w // bw
    for p in range(thw):
        ti, rem = divmod(p, h * w)
        hi, wi = divmod(rem, w)
        bid = ((ti // bt) * nbh + hi // bh) * nbw + wi // bw
        rid = ((ti % bt) * bh + hi % bh) * bw + wi % bw
        block_id[p] = bid
        rel_idx[p] = rid
    return block_id, rel_idx


@lru_cache(maxsize=16)
def posenc_rows(slice_shape: Tuple[int, int, int], d: int) -> np.ndarray:
    """(thw, d) positional-encoding table in raster order."""
    sig = _signal_np(tuple(slice_shape), d)
    return sig.reshape(-1, d)


# --------------------------------------------------------------------------
# Incremental rollout
# --------------------------------------------------------------------------

def _tup_set(t: tuple, i: int, v):
    """Replace element i of a tuple (per-layer cache pytrees)."""
    return t[:i] + (v,) + t[i + 1:]


class SliceCarry(NamedTuple):
    sl: jnp.ndarray  # (b, nc, thw) current codes
    emb: jnp.ndarray  # (b, thw, de) summed channel embeddings of final codes
    kcaches: jnp.ndarray  # (L, b, na, thw, da) stacked per-layer K cache;
    #                       under attn_impl='pallas': a length-L tuple of
    #                       fused-lane (b, thw, na*da) arrays
    vcaches: jnp.ndarray  # same layout as kcaches
    kscales: jnp.ndarray  # (L, b, na, thw) per-row K scales (int8 mode; dummy otherwise)
    vscales: jnp.ndarray  # (L, b, na, thw)
    key: jnp.ndarray


def _embed_sum_codes(dec, c: VTConfig, codes):
    """codes (..., nc) -> (..., de)."""
    out = 0.0
    for k in range(c.nc):
        out = out + jnp.take(dec["ch_embed"][k], codes[..., k], axis=0)
    return out


def _quantize_cols(w, cdtype):
    """(in, out) weight -> (int8 weight, (out,) scale). Exact fold:
    y @ (W_int * s[None, :]) == (y @ W_int) * s."""
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    wi = jnp.clip(jnp.round(w / (s[None, :] + 1e-8)), -127, 127).astype(jnp.int8)
    return wi, s.astype(cdtype)


def sample_slice_incremental(params, c: VTConfig, slice_shape, zl, sl, key,
                             primed, temp, greedy: bool = False,
                             kv_dtype: str = "native",
                             seg_size: int = 0,
                             weight_dtype: str = "native",
                             mm_dtype: str = "native",
                             attn_impl: str = "xla",
                             streams: int = 1,
                             teacher_logits: bool = False):
    """Exact AR sampling of one slice with cached decoder state.

    teacher_logits=True turns the rollout into a teacher-forced pass: every
    position keeps its ground-truth code from ``sl`` (nothing is sampled,
    ``key``/``temp`` unused), channel conditioning uses the ground-truth
    previous channels (matching vt_logits), and the per-pixel fp32 channel
    logits are returned as a third output (b, thw, nc, nv). With
    kv_dtype="native" this reproduces the teacher-forced XLA logits through
    the SAME cached-decoder arithmetic the sampler uses; with "int8"/"int4"
    it exposes exactly the logit error the quantized cache causes — the
    flagship-scale quality accounting of VERDICT r3 #2.

    params: the netG tree; zl: (b, t, h, w, d) encoder output;
    sl: (b, nc, t, h, w) initial codes (primed positions already correct);
    primed: (thw,) bool. Returns (sl, key) like
    VideoTransformer._sample_slice_pixels.

    kv_dtype: "native" keeps K/V in the param dtype (exact);
    "int8" quantizes cache rows with per-(head, position) absmax scales —
    the scales fold exactly into the attention algebra
    (q.(K_int*s) = (q.K_int)*s and sum_j w_j s_j V_int_j), so the only
    deviation is int8 rounding of K/V. Halves the dominant HBM traffic.

    weight_dtype: "int8" additionally streams the per-pixel layer weights
    (fused QKV, proj, FFN) as int8 with per-output-column absmax scales,
    folded exactly into the following multiply. NEGATIVE RESULT on DSFVT
    batch 128 (BASELINE.md): 297 vs 544 fps — unlike the K/V caches (whose
    int8 convert fuses into the attention contraction), XLA materializes
    the weight dequant for the (b, d) x (d, 3*na*da) matmuls, so traffic
    goes UP. Kept as a correct, tested option for future shapes/backends.
    "int8-pallas" runs those same int8 weights through the Pallas GEMM
    kernel (ops/quant_matmul.py): the int8 bytes feed the MXU unconverted
    (no materialized dequant), at the cost of absmax-quantizing the
    activation rows to int8 too (~0.4% rel, same order as mm_dtype='int8').

    mm_dtype: "int8" (requires kv_dtype="int8") runs the attention
    contractions as native int8 x int8 MXU dots instead of dequantizing the
    cache to the compute dtype: q is absmax-quantized per (batch, head) and
    the post-softmax weights (with the V scales folded in first) per
    (batch, head) row, so the dots read the int8 cache bytes with NO
    per-element convert — the dequant moves to the small (b, na, cl)
    logits / (b, na, da) outputs. The int8->bf16 convert of the cache is
    the co-bottleneck of the "int8" path (1 elem/lane/cycle ~= the HBM DMA
    rate), so skipping it is the only lever past that bound. Extra
    rounding: q and folded weights at int8 (~0.4% rel), on top of the K/V
    rounding the int8 cache already has.

    streams: split the batch into this many INDEPENDENT rollout streams
    advanced alternately inside one scan body (VERDICT r4 #1a). The AR
    dependency chain is per-stream — stream A's serial latency (8 strictly
    sequential layers with a softmax between the two dots of each, the
    un-hidden 32% of the r4 roofline) can hide under stream B's cache DMA,
    because XLA's latency-hiding scheduler sees two disjoint dataflow
    chains per pixel step. Batch-halving cost is known small (b512->b1024
    gained only +2.4%, BASELINE.md). Greedy output is bit-identical to
    streams=1 (same arithmetic per stream, tested); temp sampling draws
    per-stream keys, so sampled values differ from streams=1 (same
    distribution).

    attn_impl: "pallas" runs the per-pixel attention as a Pallas decode
    kernel (ops/cache_attention.py) over fused-lane (b, cl, na*da)
    caches with block-diagonal q. With kv_dtype="int8": native int8 MXU
    dots, same rounding behavior as mm_dtype="int8" (which it supersedes
    when active). With kv_dtype="native": bf16/f32 dots, no quantization
    anywhere. "xla" (default) keeps the einsum formulation on the
    (b, na, cl, da) layout. "pallas-live" (requires kv_dtype="int8") is
    the full-buffer kernel named as the precondition in pixel_step's
    3.5x-regression note: ONE preallocated fused-lane buffer per layer
    sized at the block run, a flash-decode kernel that DMAs only
    ceil(live/rtile) row tiles (the scalar-prefetched live length drives
    the BlockSpec index maps; dead tiles alias to the last live tile,
    which Pallas's block-revisit detection turns into no DMA), int8
    dequant fused into the dots — removes BOTH the segment concat copies
    (10.2% of r4 traffic) and the grow/shrink machinery (seg_size is
    ignored; stale rows are live-masked, never zeroed). Data-axis (DP) sharded
    serving works (tests/test_multichip_sampling.py); for TENSOR-parallel
    serving (model axis > 1) use attn_impl="xla" — GSPMD cannot split an
    opaque kernel call over the head dimension.
    """
    if kv_dtype not in ("native", "int8", "int4"):
        raise ValueError(
            f"kv_dtype must be 'native', 'int8' or 'int4', got {kv_dtype!r}")
    if weight_dtype not in ("native", "int8", "int8-pallas"):
        raise ValueError("weight_dtype must be 'native', 'int8' or "
                         f"'int8-pallas', got {weight_dtype!r}")
    if mm_dtype not in ("native", "int8"):
        raise ValueError(
            f"mm_dtype must be 'native' or 'int8', got {mm_dtype!r}")
    if mm_dtype == "int8" and kv_dtype != "int8":
        raise ValueError("mm_dtype='int8' requires kv_dtype='int8' "
                         "(the dots read the int8 cache bytes directly)")
    if attn_impl not in ("xla", "pallas", "pallas-live"):
        raise ValueError(f"attn_impl must be 'xla', 'pallas' or "
                         f"'pallas-live', got {attn_impl!r}")
    if attn_impl == "pallas-live" and kv_dtype != "int8":
        raise ValueError("attn_impl='pallas-live' requires kv_dtype='int8' "
                         "(full-buffer int8 flash-decode kernel)")
    if streams < 1 or sl.shape[0] % streams:
        raise ValueError(
            f"streams={streams} must be >=1 and divide the batch "
            f"({sl.shape[0]})")
    if attn_impl == "pallas" and kv_dtype not in ("int8", "native"):
        raise ValueError("attn_impl='pallas' supports kv_dtype 'int8' "
                         "(int8 MXU dots over fused-lane int8 caches) or "
                         "'native' (bf16/f32 dots, no quantization), "
                         f"not {kv_dtype!r}")
    use_int8 = kv_dtype in ("int8", "int4")
    int8_mm = mm_dtype == "int8"
    # Pallas decode kernel: fused-lane (b, cl, na*da) int8 caches + native
    # int8 x int8 MXU dots. Implies the mm_dtype='int8' rounding (q and the
    # scale-folded softmax weights are absmax-quantized per (batch, head));
    # see ops/cache_attention.py for why this is the only formulation with
    # HBM headroom past the VPU's ~120 GB/s int8 convert bound.
    pallas_attn = attn_impl in ("pallas", "pallas-live")
    # pallas-live (VERDICT r4 #1b): ONE preallocated fused-lane buffer per
    # layer, sized at the block run, reused unmodified for the whole
    # rollout. The flash-decode kernel takes the live length p_loc+1 and
    # only DMAs ceil(live/rtile) row tiles — no segment concat copies
    # (10.2% of r4 traffic), no grow/shrink, no stale-row zeroing (rows
    # >= live are masked in-kernel, so the previous block run's rows are
    # simply never read).
    live_attn = attn_impl == "pallas-live"
    # int4: same per-row absmax scheme at 15 levels; storage is jnp.int4 so
    # the cache reads halve again vs int8. Opt-in — rounding error is ~16x
    # int8's; greedy-agreement is unit-tested but expect distributional drift.
    qmax = 7.0 if kv_dtype == "int4" else 127.0
    dec = params["decoder"]
    pred = params["predictor"]
    t, h, w = slice_shape
    thw = t * h * w
    b, nc = sl.shape[:2]
    na, _, da = dec["layers"][0].wq.shape
    L = len(dec["layers"])

    nbr_np, tap_ids_np = conv_tap_table((t, h, w))
    nbr = jnp.asarray(nbr_np)  # (thw, K')
    # conv weight rows for the unmasked taps: (K', de, d)
    conv_w = dec["conv_w"].reshape(-1, c.de, c.d)[jnp.asarray(tap_ids_np)]
    pos_rows = jnp.asarray(posenc_rows((t, h, w), c.d))  # (thw, d)

    assert len({tuple(lp.wq.shape) for lp in dec["layers"]}) == 1, (
        "incremental sampler needs one head count across decoder layers; "
        "use sample_video(incremental=False) for heterogeneous stacks")
    cdtype = dec["conv_w"].dtype  # follows the (possibly bf16) param dtype
    zlproj = (zl @ dec["projector"]).reshape(b, thw, c.d)
    # Block-local cache mode: when every decoder layer shares one block
    # size whose h/w span the slice (all shipped configs — DSSVT (4,8,8) on
    # (16,8,8) slices; DSFVT/DSTSVT block == slice), raster order visits
    # attention blocks as contiguous runs of blk_run = bt*h*w pixels, and
    # cross-block attention weight is EXACTLY zero (the -1e9 logit's exp
    # underflows to 0.0, so masked rows add exact zeros to the softmax).
    # The K/V caches therefore only ever need blk_run rows: cache position
    # = p mod blk_run; rows left over from the previous block sit strictly
    # above the causal mask and are never read. For DSSVT this cuts cache
    # memory AND the dominant per-pixel cache reads 4x (1024 -> 256 rows).
    # (Reference semantics anchor: vt_attention.py:142-174 — block-local
    # attention zeroes cross-block weight.)
    blocks = [tuple(b) for b in c.blocks_d]
    bt0, bh0, bw0 = blocks[0]
    block_local = (len(set(blocks)) == 1 and bh0 == h and bw0 == w
                   and t % bt0 == 0)
    blk_run = bt0 * h * w if block_local else thw

    # Bias handling (same float values on every path):
    # * block-local runs: within a run, the block-relative index rid(p)
    #   equals p mod blk_run, so the (na, blk_run, blk_run) bank table is
    #   used directly — one dynamic row slice per pixel, no -1e9 branch.
    # * non-uniform stacks with a slice-wide layer: materialize the
    #   (na, thw, thw) permuted table (identical memory to factored).
    # * other non-uniform blocks: keep the FACTORED (na, n_b, n_b) tables
    #   and rebuild row p from block_structure (the 268 MB-saving path that
    #   un-capped DSSVT's batch in round 3 before block-local caches
    #   removed the need for slice-length rows entirely).
    bias_tabs = []
    for lp, blk in zip(dec["layers"], c.blocks_d):
        bid_np, rel_np = block_structure((t, h, w), tuple(blk))
        Bl = relative_bias(lp.dt_bank, lp.dh_bank, lp.dw_bank,
                           tuple(blk)).astype(jnp.float32)  # (na, n_b, n_b)
        n_b = Bl.shape[1]
        if block_local:
            bias_tabs.append((Bl, None, None, None, None))
        elif n_b == thw:
            # one slice-wide block: rel is a permutation, bid constant
            rel_j = jnp.asarray(rel_np)
            full = Bl[:, rel_j][:, :, rel_j]  # (na, thw, thw)
            bias_tabs.append((full, None, None, None, None))
        else:
            bias_tabs.append((Bl, jnp.asarray(rel_np), jnp.asarray(bid_np),
                              rel_np, bid_np))
    pos_rows = pos_rows.astype(cdtype)
    pos_iota = jnp.arange(thw)
    # fused per-layer QKV: one (d, 3*na*da) matmul per layer instead of
    # three — the [q heads | k heads | v heads] column layout is owned by
    # ops/fused_layer._wqkv_flat (one contract, two consumers)
    wqkv = [_wqkv_flat(lp.wq, lp.wk, lp.wv) for lp in dec["layers"]]
    use_int8_w = weight_dtype in ("int8", "int8-pallas")
    pallas_w = weight_dtype == "int8-pallas"
    if use_int8_w:
        # quantized ONCE here; inside the pixel scan each matmul streams the
        # int8 bytes and folds the column scales into the product
        wqkv = [_quantize_cols(w, cdtype) for w in wqkv]
        proj_q = [_quantize_cols(lp.proj, cdtype) for lp in dec["layers"]]
        ffn1_q = [_quantize_cols(lp.ffn_w1, cdtype) for lp in dec["layers"]]
        ffn2_q = [_quantize_cols(lp.ffn_w2, cdtype) for lp in dec["layers"]]

    def _mm(y, w):
        """y @ w for native weights, (y @ w_int) * scale for int8; the
        int8-pallas variant adds per-row activation quantization so the
        int8 bytes feed the MXU directly (ops/quant_matmul.py)."""
        if isinstance(w, tuple):
            wi, s = w
            if pallas_w:
                return matmul_i8w_pallas(y, wi, s, out_dtype=cdtype)
            return (y @ wi.astype(cdtype)) * s
        return y @ w

    def _bias_row(l, p, p_loc, cache_len):
        """Layer l's bias row for pixel p vs cache rows [0, cache_len):
        (na, cache_len) f32. Value = Bl[a, rel[p], rel[j]] within p's
        attention block, -1e9 across blocks; identical floats on the
        direct-table and factored paths (see bias_tabs above)."""
        Bl, rel_j, bid_j, rel_np_l, bid_np_l = bias_tabs[l]
        if rel_j is None:
            return jnp.take(Bl, p_loc, axis=1)[:, :cache_len]
        Bp = jnp.take(Bl, rel_j[p], axis=1)  # (na, n_b) dynamic slice
        row = Bp[:, rel_np_l[:cache_len]]  # const-index gather
        return jnp.where(
            jnp.asarray(bid_np_l[:cache_len]) == bid_j[p], row,
            jnp.float32(-1e9))

    def pixel_step(carry: SliceCarry, p, zlp):
        """One raster position of ONE stream (zlp = that stream's zl
        projection; batch size derived from the carry — streams carry
        b // streams rows each). The K/V caches in `carry` hold at most
        blk_run rows (segmented growth below); position p reads and writes
        cache row p_loc = p mod blk_run — exact because p only attends
        within its contiguous attention block (see block-local notes).

        A preallocate-at-blk_run + static-prefix-slice variant was tried in
        round 4 and MEASURED 3.5x SLOWER end-to-end (47.0 s vs 13.5 s,
        DSFVT b1024 int8 seg16): XLA materializes the `cache[:cache_len]`
        slice (plus its int8->bf16 convert) instead of fusing it into the
        attention contraction, tripling the dominant cache-read traffic.
        The concat-grow below re-copies the cache at each segment boundary
        (~10% of traffic at this geometry, tools/mfu.py --sample) but keeps
        every buffer exactly cache_len rows so the dots read it directly —
        do not retry the slice form without a fused kernel.

        NOTE closure contract: this body references `kv_store` /
        `_cache_zeros`, which are assigned ~100 lines BELOW (the cache
        layout depends on seg bookkeeping computed there). That is safe
        only because pixel_step is first traced at the lax.scan call at
        the end of this function."""
        bs = carry.sl.shape[0]  # stream batch (b // streams)
        cache_len = (carry.kcaches[0].shape[1] if pallas_attn
                     else carry.kcaches.shape[3])
        p_loc = jax.lax.rem(p, jnp.int32(blk_run)) if block_local else p
        # causal conv at p: gather unmasked-tap neighbors (all strictly < p)
        rows = carry.emb[:, nbr[p]]  # (bs, K', de); nbr -1 wraps to last row
        valid = (nbr[p] >= 0).astype(rows.dtype)[None, :, None]
        x = jnp.einsum("bke,ked->bd", rows * valid, conv_w) + dec["conv_b"]
        x = x + pos_rows[p] + zlp[:, p]

        # unrolled layer loop: a lax.scan here costs ~3.5x runtime (per-
        # iteration scan overhead dwarfs the tiny per-layer body inside the
        # 4096-step pixel scan); the stacked cache layout is kept
        new_k = carry.kcaches
        new_v = carry.vcaches
        new_ks = carry.kscales
        new_vs = carry.vscales
        for l in range(L):
            lp: BlockAttnParams = dec["layers"][l]
            y = _layer_norm(x, lp.ln_scale, lp.ln_bias)
            qkv = _mm(y, wqkv[l]).reshape(bs, 3, na, da)
            q, kk, vv = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            if use_int8:
                # absmax row quantization like quantize_rows_i8, but
                # DELIBERATELY with cdtype scales (not fp32): the scale
                # buffers ride the scan carry next to the caches, and this
                # is the numerics the int8-KV path was measured/tested at
                sk = jnp.max(jnp.abs(kk), axis=-1).astype(cdtype) / qmax
                sv = jnp.max(jnp.abs(vv), axis=-1).astype(cdtype) / qmax
                kk = jnp.clip(jnp.round(kk / (sk[..., None] + 1e-8)),
                              -qmax, qmax).astype(kv_store)
                vv = jnp.clip(jnp.round(vv / (sv[..., None] + 1e-8)),
                              -qmax, qmax).astype(kv_store)
                if live_attn:
                    # row-major scale caches (bs, R, na): the live kernel's
                    # Mosaic-legal layout (row axis second-to-last)
                    new_ks = _tup_set(new_ks, l,
                                      new_ks[l].at[:, p_loc].set(sk))
                    new_vs = _tup_set(new_vs, l,
                                      new_vs[l].at[:, p_loc].set(sv))
                elif pallas_attn:
                    new_ks = _tup_set(new_ks, l,
                                      new_ks[l].at[:, :, p_loc].set(sk))
                    new_vs = _tup_set(new_vs, l,
                                      new_vs[l].at[:, :, p_loc].set(sv))
                else:
                    new_ks = new_ks.at[l, :, :, p_loc].set(sk)
                    new_vs = new_vs.at[l, :, :, p_loc].set(sv)
            if pallas_attn:
                # per-layer (unstacked) caches: the kernel consumes each
                # layer's array directly — a stacked (L, ...) carry would
                # hand the custom call a new_k[l] slice that XLA may have
                # to materialize as a copy
                new_k = _tup_set(new_k, l, new_k[l].at[:, p_loc, :].set(
                    kk.reshape(bs, na * da)))
                new_v = _tup_set(new_v, l, new_v[l].at[:, p_loc, :].set(
                    vv.reshape(bs, na * da)))
            else:
                new_k = new_k.at[l, :, :, p_loc].set(kk)
                new_v = new_v.at[l, :, :, p_loc].set(vv)
            kc = new_k[l]
            vc = new_v[l]

            if pallas_attn:
                # bias row, b-independent: (1, na, cl) f32
                row = _bias_row(l, p, p_loc, cache_len)
                if live_attn:
                    # causal masking happens in-kernel from the live length;
                    # bias/q-scale rows go in the kernel's row-major layouts
                    qi, sq = quantize_rows_i8(q)
                    out = decode_attention_i8_live_pallas(
                        p_loc + 1, blockdiag_expand(qi),
                        jnp.swapaxes(sq, 1, 2),
                        kc, new_ks[l], vc, new_vs[l], row.T[None],
                        1.0 / np.sqrt(da), out_dtype=cdtype)  # (bs, na*da)
                elif use_int8:
                    extra = jnp.where(
                        pos_iota[None, None, :cache_len] > p_loc,
                        jnp.float32(-1e9), row[None])
                    qi, sq = quantize_rows_i8(q)
                    out = decode_attention_i8_pallas(
                        blockdiag_expand(qi), sq,
                        kc, new_ks[l], vc, new_vs[l], extra,
                        1.0 / np.sqrt(da), out_dtype=cdtype)  # (bs, na*da)
                else:
                    extra = jnp.where(
                        pos_iota[None, None, :cache_len] > p_loc,
                        jnp.float32(-1e9), row[None])
                    out = decode_attention_pallas(
                        blockdiag_expand(q), kc, vc, extra,
                        1.0 / np.sqrt(da), out_dtype=cdtype)
            else:
                if int8_mm:
                    # native int8 x int8 MXU dot: quantize q per (b, head)
                    # so the cache bytes feed the MXU unconverted; dequant
                    # on the small logits instead of the big cache
                    qi, sq = quantize_rows_i8(q)
                    logits = jnp.einsum(
                        "bak,bajk->baj", qi, kc,
                        preferred_element_type=jnp.int32).astype(jnp.float32)
                    logits = logits * (sq / np.sqrt(da))
                else:
                    logits = jnp.einsum(
                        "bak,bajk->baj", q, kc.astype(cdtype),
                        preferred_element_type=jnp.float32) / np.sqrt(da)
                if use_int8:
                    logits = logits * new_ks[l].astype(jnp.float32)
                row = _bias_row(l, p, p_loc, cache_len)
                logits = logits + row[None]  # (b, na, cl)
                logits = jnp.where(pos_iota[None, None, :cache_len] > p_loc,
                                   jnp.float32(-1e9), logits)
                if int8_mm:
                    # fold the V scales in fp32 FIRST, then quantize the
                    # weight row per (b, head): sum_j w'_int_j V_int_j * sw.
                    # All scale math + the int32 dequant stay fp32 — the
                    # same rounding as decode_attention_i8_pallas (casting
                    # the int32 accumulator to bf16 first would stack a
                    # ~0.2% mantissa error on the int8 rounding)
                    wgt_f = jax.nn.softmax(logits, axis=-1)  # f32
                    if use_int8:
                        wgt_f = wgt_f * new_vs[l].astype(jnp.float32)
                    wi, sw = quantize_rows_i8(wgt_f)
                    out = jnp.einsum("baj,bajk->bak", wi, vc,
                                     preferred_element_type=jnp.int32)
                    out = (out.astype(jnp.float32) * sw
                           ).astype(cdtype).reshape(bs, na * da)
                else:
                    # softmax weights round to cdtype BEFORE the V dot —
                    # the deliberate precision convention of this sampler
                    # (the fused training kernels round softmax to bf16 the
                    # same way); it keeps the dot at MXU bf16 rate with the
                    # int8 cache dequant fused into it. fp32 params make it
                    # a no-op (the greedy bit-match tests' regime).
                    wgt = jax.nn.softmax(logits, axis=-1).astype(cdtype)
                    if use_int8:
                        wgt = wgt * new_vs[l]  # fold V scales into the weights
                    out = jnp.einsum("baj,bajk->bak", wgt,
                                     vc.astype(cdtype)).reshape(bs, na * da)
            x = _mm(out, proj_q[l] if use_int8_w else lp.proj) + x
            # FFN at p
            yf = _layer_norm(x, lp.ffn_ln_scale, lp.ffn_ln_bias)
            yf = jax.nn.relu(
                _mm(yf, ffn1_q[l] if use_int8_w else lp.ffn_w1) + lp.ffn_b1)
            x = _mm(yf, ffn2_q[l] if use_int8_w else lp.ffn_w2) + lp.ffn_b2 + x

        y_pix = _layer_norm(x, pred["ln_scale"], pred["ln_bias"])
        if teacher_logits:
            # teacher-forced: keep the ground-truth codes, condition the
            # channel AR on the ground-truth previous channels (vt_logits
            # semantics), emit the fp32 logits as the scan output
            final = carry.sl[:, :, p]  # (b, nc) ground truth
            outs = []
            for k in range(c.nc):
                u = _predictor_u(pred, c, k, y_pix, final)
                outs.append(_predictor_head(pred, c, k, u, dec)
                            .astype(jnp.float32))
            step_out = jnp.stack(outs, axis=1)  # (b, nc, nv)
            key = carry.key
        else:
            key, sub = jax.random.split(carry.key)
            sampled = vt_sample_pixel_channels(params, c, y_pix, sub, temp,
                                               greedy=greedy)  # (b, nc)
            old = carry.sl[:, :, p]
            final = jnp.where(primed[p], old, sampled)
            step_out = None
        sl_new = carry.sl.at[:, :, p].set(final)
        emb_new = carry.emb.at[:, p].set(_embed_sum_codes(dec, c, final))
        return SliceCarry(sl_new, emb_new, new_k, new_v, new_ks, new_vs,
                          key), step_out

    sl_flat = sl.reshape(b, nc, thw)
    emb0 = _embed_sum_codes(dec, c, jnp.moveaxis(sl_flat, 1, -1))  # (b, thw, de)
    bs = b // streams  # per-stream batch
    # per-stream views of the slice state; at streams=1 these are the
    # arrays themselves (the scan below is then structurally identical to
    # the historical single-stream scan)
    sl_streams = jnp.split(sl_flat, streams, axis=0)
    emb_streams = jnp.split(emb0.astype(cdtype), streams, axis=0)
    zl_streams = jnp.split(zlproj, streams, axis=0)
    if streams == 1:
        keys = [key]
    else:
        keys = list(jax.random.split(key, streams))

    # Segmented cache growth WITHIN each block run: pixels [base, base+s1)
    # only ever attend to the first s1 rows of the run, so early segments
    # run with short K/V buffers — the cache reads dominate HBM traffic at
    # large batch, and the triangular prefix cuts them ~1.6x. Segment
    # boundaries are static; each segment is its own scan over a fixed-size
    # carry. At a new block run the buffers shrink back to the first
    # segment length (stale rows are masked, values never read). The concat
    # at each boundary re-copies the cache (~10% of traffic at DSFVT b1024,
    # tools/mfu.py --sample) — the preallocate-then-slice alternative
    # measured 3.5x slower (see pixel_step docstring).
    seg = seg_size if seg_size > 0 else max(64, blk_run // 4)
    seg = min(seg, blk_run)
    bounds = list(range(seg, blk_run + 1, seg)) or [blk_run]
    if bounds[-1] != blk_run:
        bounds.append(blk_run)
    if live_attn:
        # full preallocated buffers: one scan per block run, no segment
        # boundaries (the kernel's live length replaces segmented growth)
        bounds = [blk_run]

    kv_store = {"int8": jnp.int8, "int4": jnp.int4}.get(kv_dtype, cdtype)
    scale_len0 = bounds[0] if use_int8 else 1
    # cache layout: stacked (L, b, na, cl, da) for the XLA paths; per-layer
    # tuples of fused-lane (b, cl, na*da) for the Pallas decode kernel (the
    # custom call consumes whole arrays — no new_k[l] slice to materialize)

    def _cache_zeros(rows):
        if pallas_attn:
            return tuple(jnp.zeros((bs, rows, na * da), kv_store)
                         for _ in range(L))
        return jnp.zeros((L, bs, na, rows, da), kv_store)

    def _scale_zeros(rows):
        if live_attn:  # row-major (see the live kernel's layout note)
            return tuple(jnp.zeros((bs, rows, na), cdtype) for _ in range(L))
        if pallas_attn:
            return tuple(jnp.zeros((bs, na, rows), cdtype) for _ in range(L))
        return jnp.zeros((L, bs, na, rows), cdtype)

    carries = tuple(SliceCarry(
        sl=sl_streams[s],
        emb=emb_streams[s],
        kcaches=_cache_zeros(bounds[0]),
        vcaches=_cache_zeros(bounds[0]),
        kscales=_scale_zeros(scale_len0),
        vscales=_scale_zeros(scale_len0),
        key=keys[s],
    ) for s in range(streams))

    def _shrink(cache, rows):
        if pallas_attn:
            return tuple(c[:, :rows] for c in cache)
        return cache[:, :, :, :rows]

    def _shrink_scales(scales, rows):
        if pallas_attn:
            return tuple(s[:, :, :rows] for s in scales)
        return scales[:, :, :, :rows]

    def _grow(cache, pad):
        if pallas_attn:
            return tuple(jnp.concatenate([c, p], axis=1)
                         for c, p in zip(cache, pad))
        return jnp.concatenate([cache, pad], axis=3)

    def _grow_scales(scales, pad):
        if pallas_attn:
            return tuple(jnp.concatenate([s, p], axis=2)
                         for s, p in zip(scales, pad))
        return jnp.concatenate([scales, pad], axis=3)

    def _rows(cache):
        return cache[0].shape[1] if pallas_attn else cache.shape[3]

    def multi_step(carries, p):
        """Advance every stream one raster position. The per-stream calls
        are DISJOINT dataflow chains (own carry, own zl projection) placed
        alternately in program order — the freedom the latency-hiding
        scheduler needs to hide one stream's serial chain under another's
        cache DMA."""
        news, outs = [], []
        for s in range(streams):
            c2, o = pixel_step(carries[s], p, zl_streams[s])
            news.append(c2)
            outs.append(o)
        return tuple(news), (tuple(outs) if teacher_logits else None)

    seg_outs = []
    for base in range(0, thw, blk_run):
        if base > 0:
            # new block run: shrink buffers to the first segment length
            carries = tuple(cr._replace(
                kcaches=_shrink(cr.kcaches, bounds[0]),
                vcaches=_shrink(cr.vcaches, bounds[0]),
                kscales=_shrink_scales(cr.kscales, scale_len0),
                vscales=_shrink_scales(cr.vscales, scale_len0),
            ) for cr in carries)
        start = 0
        for end in bounds:
            grow = end - _rows(carries[0].kcaches)
            if grow > 0:
                new_carries = []
                for cr in carries:
                    pad = _cache_zeros(grow)
                    cr = cr._replace(
                        kcaches=_grow(cr.kcaches, pad),
                        vcaches=_grow(cr.vcaches, pad),
                    )
                    if use_int8:
                        spad = _scale_zeros(grow)
                        cr = cr._replace(
                            kscales=_grow_scales(cr.kscales, spad),
                            vscales=_grow_scales(cr.vscales, spad),
                        )
                    new_carries.append(cr)
                carries = tuple(new_carries)
            carries, ys = jax.lax.scan(multi_step, carries,
                                       jnp.arange(base + start, base + end))
            seg_outs.append(ys)
            start = end
    sl_out = jnp.concatenate([cr.sl for cr in carries], axis=0)
    if teacher_logits:
        # seg_outs: list over segments of per-stream (seg_len, bs, nc, nv)
        logits = jnp.concatenate(
            [jnp.concatenate([ys[s] for ys in seg_outs], axis=0)
             for s in range(streams)], axis=1)  # (thw, b, nc, nv)
        logits = jnp.moveaxis(logits, 0, 1)  # (b, thw, nc, nv)
        return sl_out.reshape(b, nc, t, h, w), carries[0].key, logits
    return sl_out.reshape(b, nc, t, h, w), carries[0].key
