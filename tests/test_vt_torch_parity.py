"""Full VideoTransformer parity: a torch-ops oracle consuming a torch-layout
state dict vs our JAX forward consuming the converted params. Cross-validates
the whole .pth converter AND every forward component (one-hot context conv ==
gather conv, masked conv, posenc, block attention, channel predictor)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lvt_tpu.checkpoint.torch_convert import convert_video_transformer
from lvt_tpu.models.vt import VTConfig, vt_logits
from lvt_tpu.ops import attention as attn_ops


def _make_torch_state(rng, c: VTConfig, S):
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.1
    sd = {}
    sd["encoder.conv.weight"] = r(c.de, c.nc * c.nv, *c.kernel)
    sd["encoder.conv.bias"] = r(c.de)
    sd["encoder.slice_embedding.weight"] = r(S, c.de)
    sd["encoder.linear_projector.weight"] = r(c.d, c.de, 1, 1, 1)
    for pfx, blocks in (("encoder", c.blocks_e), ("decoder", c.blocks_d)):
        for i, blk in enumerate(blocks):
            t, h, w = blk
            na = c.n_head_e[i] if pfx == "encoder" else c.n_head_d[i]
            p = f"{pfx}.block_local_attention.{i}"
            sd[f"{p}.mha.layer_norm.weight"] = 1 + r(c.d)
            sd[f"{p}.mha.layer_norm.bias"] = r(c.d)
            sd[f"{p}.mha.w_q"] = r(na, c.d, c.da)
            sd[f"{p}.mha.w_k"] = r(na, c.d, c.da)
            sd[f"{p}.mha.w_v"] = r(na, c.d, c.da)
            sd[f"{p}.mha.proj.weight"] = r(c.d, na * c.da)
            sd[f"{p}.ffn.0.weight"] = 1 + r(c.d)
            sd[f"{p}.ffn.0.bias"] = r(c.d)
            sd[f"{p}.ffn.1.weight"] = r(c.d, c.d)
            sd[f"{p}.ffn.1.bias"] = r(c.d)
            sd[f"{p}.ffn.3.weight"] = r(c.d, c.d)
            sd[f"{p}.ffn.3.bias"] = r(c.d)
            sd[f"{p}.dt_bank"] = r(na, 2 * t - 1)
            sd[f"{p}.dh_bank"] = r(na, 2 * h - 1)
            sd[f"{p}.dw_bank"] = r(na, 2 * w - 1)
    for k in range(c.nc):
        sd[f"decoder.ch_embedder.{k}.weight"] = r(c.nv, c.de)
    sd["decoder.conv.conv.weight"] = r(c.d, c.de, 3, 3, 3)
    sd["decoder.conv.conv.bias"] = r(c.d)
    sd["decoder.linear_projector.weight"] = r(c.d, c.d, 1, 1, 1)
    sd["ch_predictor.layer_norm.weight"] = 1 + r(c.d)
    sd["ch_predictor.layer_norm.bias"] = r(c.d)
    for k in range(c.nc):
        sd[f"ch_predictor.U.{k}.weight"] = r(c.d, c.d + k * c.nv)
        sd[f"ch_predictor.U.{k}.bias"] = r(c.d)
        sd[f"ch_predictor.P.{k}.weight"] = r(c.nv, c.d)
        sd[f"ch_predictor.P.{k}.bias"] = r(c.nv)
    return sd


def _t(sd, k):
    v = sd[k]
    # pass tensors through so the oracle is differentiable when fed a
    # requires_grad state dict (trajectory parity, test_trajectory_parity.py)
    return v if torch.is_tensor(v) else torch.from_numpy(v)


def _torch_posenc(x, d):
    # (b, d, t, h, w) += 3-D sin/cos bands, axis-major channel layout
    b, _, t, h, w = x.shape
    nts = d // 6
    inv = torch.exp(torch.arange(nts, dtype=torch.float32) * -(np.log(1e4) / nts))
    for dim, ln in enumerate((t, h, w)):
        pos = torch.arange(ln, dtype=torch.float32)
        scaled = pos[:, None] * inv[None, :]
        sig = torch.cat([torch.sin(scaled), torch.cos(scaled)], 1)  # (ln, 2nts)
        band = torch.zeros(ln, d)
        band[:, dim * 2 * nts : (dim + 1) * 2 * nts] = sig
        shape = [1, d, 1, 1, 1]
        shape[2 + dim] = ln
        x = x + band.T.reshape(shape)
    return x


def _torch_attn_layer(sd, pfx, i, x, blk, na, da, masked):
    """x: (b, d, T, H, W) through one BlockLocalAttention, torch ops only."""
    b, d, T, H, W = x.shape
    t, h, w = blk
    thw = t * h * w
    p = f"{pfx}.block_local_attention.{i}"

    xx = x.reshape(b, d, T // t, t, H // h, h, W // w, w)
    xx = xx.permute(0, 2, 4, 6, 3, 5, 7, 1).reshape(-1, thw, d)

    y = F.layer_norm(xx, (d,), _t(sd, f"{p}.mha.layer_norm.weight"),
                     _t(sd, f"{p}.mha.layer_norm.bias"))
    q = torch.einsum("bnd,adk->abnk", y, _t(sd, f"{p}.mha.w_q"))
    k = torch.einsum("bnd,adk->abnk", y, _t(sd, f"{p}.mha.w_k"))
    v = torch.einsum("bnd,adk->abnk", y, _t(sd, f"{p}.mha.w_v"))
    scores = q @ k.transpose(2, 3) / np.sqrt(da)

    # decomposed relative bias (reference get_B formula)
    dt, dh, dw = attn_ops._delta_indices((t, h, w))
    B = (_t(sd, f"{p}.dt_bank")[:, dt.reshape(-1)]
         + _t(sd, f"{p}.dh_bank")[:, dh.reshape(-1)]
         + _t(sd, f"{p}.dw_bank")[:, dw.reshape(-1)]).reshape(na, thw, thw)
    scores = scores + B[:, None]
    if masked:
        m = torch.from_numpy(attn_ops.causal_mask(thw).copy())
        scores = scores.masked_fill(m, -1e4)
    a = torch.softmax(scores, dim=-1)
    out = (a @ v).permute(1, 2, 0, 3).reshape(-1, thw, na * da)
    out = out @ _t(sd, f"{p}.mha.proj.weight").T
    xx = out + xx
    y = F.layer_norm(xx, (d,), _t(sd, f"{p}.ffn.0.weight"), _t(sd, f"{p}.ffn.0.bias"))
    y = torch.relu(y @ _t(sd, f"{p}.ffn.1.weight").T + _t(sd, f"{p}.ffn.1.bias"))
    y = y @ _t(sd, f"{p}.ffn.3.weight").T + _t(sd, f"{p}.ffn.3.bias")
    xx = y + xx

    xx = xx.reshape(b, T // t, H // h, W // w, t, h, w, d)
    xx = xx.permute(0, 7, 1, 4, 2, 5, 3, 6).reshape(b, d, T, H, W)
    return xx


def _torch_vt_logits(sd, c: VTConfig, ctx, sl, slice_idx):
    return _torch_vt_logits_t(sd, c, ctx, sl, slice_idx).detach().numpy()


def _torch_vt_logits_t(sd, c: VTConfig, ctx, sl, slice_idx):
    """Teacher-forced logits with torch ops from the torch-layout state dict
    (differentiable: returns the tensor).
    ctx: (b, nc, T', H', W') int (pad=-1); sl: (b, nc, t, h, w) int."""
    b = ctx.shape[0]
    ctxt = torch.from_numpy(ctx)
    mask = ctxt == c.pad_value
    oh = F.one_hot(ctxt.masked_fill(mask, 0).long(), c.nv)
    oh = oh.masked_fill(mask.unsqueeze(-1), 0)  # (b, nc, T', H', W', nv)
    oh = oh.permute(0, 1, 5, 2, 3, 4).reshape(
        b, c.nc * c.nv, *ctx.shape[2:]).float()
    x = F.conv3d(oh, _t(sd, "encoder.conv.weight"), _t(sd, "encoder.conv.bias"),
                 stride=c.stride)
    semb = _t(sd, "encoder.slice_embedding.weight")[slice_idx]
    x = x + semb[:, :, None, None, None]
    x = F.conv3d(x, _t(sd, "encoder.linear_projector.weight"), None)
    for i, blk in enumerate(c.blocks_e):
        x = _torch_attn_layer(sd, "encoder", i, x, blk, c.n_head_e[i], c.da, False)
    zl = x

    slt = torch.from_numpy(sl).long()
    emb = sum(_t(sd, f"decoder.ch_embedder.{k}.weight")[slt[:, k]]
              for k in range(c.nc))  # (b, t, h, w, de)
    emb = emb.permute(0, 4, 1, 2, 3)
    wconv = _t(sd, "decoder.conv.conv.weight").clone()
    wconv[:, :, -1, -1, wconv.shape[-1] // 2 :] = 0
    y = F.conv3d(F.pad(emb, [1, 1, 2, 0, 2, 0]), wconv,
                 _t(sd, "decoder.conv.conv.bias"))
    y = _torch_posenc(y, c.d)
    y = y + F.conv3d(zl, _t(sd, "decoder.linear_projector.weight"), None)
    for i, blk in enumerate(c.blocks_d):
        y = _torch_attn_layer(sd, "decoder", i, y, blk, c.n_head_d[i], c.da, True)

    bq, d, t, h, w = y.shape
    yl = y.reshape(bq, d, -1).transpose(1, 2)  # (b, thw, d)
    yl = F.layer_norm(yl, (d,), _t(sd, "ch_predictor.layer_norm.weight"),
                      _t(sd, "ch_predictor.layer_norm.bias"))
    slf = slt.reshape(bq, c.nc, -1).transpose(1, 2)  # (b, thw, nc)
    oh = F.one_hot(slf, c.nv).reshape(bq, t * h * w, c.nc * c.nv).float()
    outs = []
    for k in range(c.nc):
        feats = yl if k == 0 else torch.cat([yl, oh[:, :, : k * c.nv]], dim=2)
        u = feats @ _t(sd, f"ch_predictor.U.{k}.weight").T + _t(sd, f"ch_predictor.U.{k}.bias")
        o = torch.relu(u) @ _t(sd, f"ch_predictor.P.{k}.weight").T + _t(sd, f"ch_predictor.P.{k}.bias")
        outs.append(o)
    return torch.stack(outs, dim=2).reshape(bq, t, h, w, c.nc, c.nv)


def test_full_vt_logits_match_torch_oracle(rng):
    c = VTConfig(nc=2, nv=8, kernel=(3, 1, 1), stride=(4, 1, 1), d=24, da=12,
                 de=12, blocks_e=((1, 4, 4),) * 2, n_head_e=(2, 2),
                 blocks_d=((1, 4, 4),) * 2, n_head_d=(2, 2), n_prime=1,
                 pad_value=-1, share_p=False, share_embeddings=False,
                 class_num=0)
    S = 4
    sd = _make_torch_state(rng, c, S)
    params = convert_video_transformer(sd, c)

    # geometry: T=4,H=4,W=4, slice (1,4,4), ctx (3,4,4) after ss_shift
    ctx = rng.integers(-1, c.nv, size=(2, c.nc, 3, 4, 4)).astype(np.int32)
    sl = rng.integers(0, c.nv, size=(2, c.nc, 1, 4, 4)).astype(np.int32)
    sidx = np.asarray([1, 3], np.int32)

    want = _torch_vt_logits(sd, c, ctx, sl, sidx)
    got = np.asarray(vt_logits(params, c, jnp.asarray(ctx), jnp.asarray(sl),
                               jnp.asarray(sidx), use_pallas=False))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_full_vt_logits_match_torch_oracle_dstsvt_geometry(rng):
    """Spatio-temporal stride with 3-D kernel and multi-block attention."""
    c = VTConfig(nc=2, nv=8, kernel=(3, 3, 3), stride=(2, 2, 2), d=24, da=12,
                 de=12, blocks_e=((2, 2, 2),), n_head_e=(2,),
                 blocks_d=((2, 2, 2),), n_head_d=(2,), n_prime=1,
                 pad_value=-1, share_p=False, share_embeddings=False,
                 class_num=0)
    S = 8
    sd = _make_torch_state(rng, c, S)
    params = convert_video_transformer(sd, c)

    # T=H=W=4 -> slice (2,2,2); ctx shape = kernel + (slice-1)*stride = (5,5,5)
    ctx = rng.integers(-1, c.nv, size=(1, c.nc, 5, 5, 5)).astype(np.int32)
    sl = rng.integers(0, c.nv, size=(1, c.nc, 2, 2, 2)).astype(np.int32)
    sidx = np.asarray([5], np.int32)

    want = _torch_vt_logits(sd, c, ctx, sl, sidx)
    got = np.asarray(vt_logits(params, c, jnp.asarray(ctx), jnp.asarray(sl),
                               jnp.asarray(sidx), use_pallas=False))
    np.testing.assert_allclose(got, want, atol=3e-4)
