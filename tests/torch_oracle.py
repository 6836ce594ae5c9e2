"""Pure-torch oracle of the reference model semantics, used ONLY as a test
fixture for the converter/parity harness.

Implements the documented behavior of reference models/{vits,fusion_blocks,
deepavfusion,avmae}.py (see SURVEY.md §2.1 #8-11) with reference-compatible
state_dict key names, so ``convert/torch2jax.py`` can consume its state_dict
exactly as it would consume a released checkpoint. No timm dependency.

Quirks intentionally present (they are part of the reference semantics):
  * fusion residuals are added to the *normalized* fusion tokens;
  * 'token' arch applies norm1_img to audio and norm1_aud to image, and the
    cross-attention source is cat(audio, image);
  * 'dense_mmi' builds (audio_i ⊕ image_j) pairs, audio-major;
  * Dense/Factorized attention scale uses the unreduced head dim;
  * the trunk discards the fusion tokens' outputs from the modality blocks
    and updates the fusion track from pre-block modality states.
"""
from __future__ import annotations

import math

import numpy as np
import torch
from torch import nn

from deepavfusion_tpu.ops import pos_embed as pe


def attention(q, k, v, heads, scale):
    b, nq, dq = q.shape
    nk = k.shape[1]
    q = q.reshape(b, nq, heads, -1).permute(0, 2, 1, 3)
    k = k.reshape(b, nk, heads, -1).permute(0, 2, 1, 3)
    v = v.reshape(b, nk, heads, -1).permute(0, 2, 1, 3)
    w = (q @ k.transpose(-2, -1) * scale).softmax(-1)
    out = (w @ v).transpose(1, 2)
    return out.reshape(b, nq, -1)


class OracleMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(nn.functional.gelu(self.fc1(x)))


class OracleBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0, eps=1e-6):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = OracleMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        d = x.shape[-1]
        y = self.norm1(x)
        q, k, v = self.attn.qkv(y).chunk(3, dim=-1)
        y = attention(q, k, v, self.heads, (d // self.heads) ** -0.5)
        x = x + self.attn.proj(y)
        x = x + self.mlp(self.norm2(x))
        return x


class OracleViT(nn.Module):
    def __init__(self, input_size, patch, in_chans, dim, depth, heads, mlp_ratio=4.0):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(in_chans, dim, patch, patch)
        gh, gw = input_size[0] // patch[0], input_size[1] // patch[1]
        self.grid = (gh, gw)
        table = pe.sincos_2d(dim, (gh, gw))[None]
        self.pos_embed = nn.Parameter(torch.from_numpy(table.copy()), requires_grad=False)
        self.blocks = nn.ModuleList(
            [OracleBlock(dim, heads, mlp_ratio) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def prepare(self, x, ids_keep=None):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        if ids_keep is not None:
            x = x.gather(1, ids_keep[:, :, None].expand(-1, -1, x.shape[-1]))
        return x


class OracleCrossAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, dim * 2)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x1, x2):
        d = x1.shape[-1]
        q = self.q(x1)
        k, v = self.kv(x2).chunk(2, dim=-1)
        out = attention(q, k, v, self.heads, (d // self.heads) ** -0.5)
        return self.proj(out)


def pairs(major, minor):
    b, n1, d = major.shape
    n2 = minor.shape[1]
    a = major[:, :, None, :].expand(b, n1, n2, d)
    c = minor[:, None, :, :].expand(b, n1, n2, d)
    return torch.cat([a, c], dim=-1).reshape(b, n1 * n2, 2 * d)


class OracleFusionAttnFactorized(nn.Module):
    def __init__(self, dim, heads, attn_ratio, tkns):
        super().__init__()
        self.heads, self.tkns = heads, tkns
        self.scale = (dim // heads) ** -0.5  # unreduced head dim
        inner = int(dim * attn_ratio)
        self.attn_v = OracleCrossAttention(dim, heads)
        self.attn_a = OracleCrossAttention(dim, heads)
        self.q = nn.Linear(dim, inner)
        self.k = nn.Linear(dim * 2, inner)
        self.v = nn.Linear(dim * 2, dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, xmm, xv, xa):
        nmm, nv, na = self.tkns
        xmm2, xmm_v, xmm_a = xmm.split((nmm, nv, na), dim=1)
        xmm_v = self.attn_v(xmm_v, xv)
        xmm_a = self.attn_a(xmm_a, xa)
        xva = pairs(xmm_v, xmm_a)
        out = attention(self.q(xmm2), self.k(xva), self.v(xva), self.heads, self.scale)
        out = self.proj(out)
        return torch.cat([out, xmm_v, xmm_a], dim=1)


class OracleFusionAttnToken(nn.Module):
    def __init__(self, dim, heads, attn_ratio):
        super().__init__()
        self.heads = heads
        inner = int(dim * attn_ratio)
        self.scale = (inner // heads) ** -0.5  # reduced head dim
        self.q = nn.Linear(dim, inner)
        self.kv = nn.Linear(dim, inner * 2)
        self.proj = nn.Linear(inner, dim)

    def forward(self, xmm, src):
        q = self.q(xmm)
        k, v = self.kv(src).chunk(2, dim=-1)
        return self.proj(attention(q, k, v, self.heads, self.scale))


class OracleFusionAttnDense(nn.Module):
    def __init__(self, dim, heads, attn_ratio):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5  # unreduced head dim
        inner = int(dim * attn_ratio)
        self.q = nn.Linear(dim, inner)
        self.kv = nn.Linear(dim * 2, inner * 2)
        self.proj = nn.Linear(inner, dim)

    def forward(self, xmm, xva):
        q = self.q(xmm)
        k, v = self.kv(xva).chunk(2, dim=-1)
        return self.proj(attention(q, k, v, self.heads, self.scale))


class OracleFusionBlock(nn.Module):
    def __init__(self, dim, heads, arch, attn_ratio=0.25, mlp_ratio=1.0, tkns=(4, 2, 2)):
        super().__init__()
        self.arch = arch
        self.norm1_mm = nn.LayerNorm(dim)
        self.norm1_aud = nn.LayerNorm(dim)
        self.norm1_img = nn.LayerNorm(dim)
        if arch == "factorized_mmi":
            self.attn = OracleFusionAttnFactorized(dim, heads, attn_ratio, tkns)
        elif arch == "token":
            self.attn = OracleFusionAttnToken(dim, heads, attn_ratio)
        else:
            self.attn = OracleFusionAttnDense(dim, heads, attn_ratio)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = OracleMlp(dim, int(dim * mlp_ratio))

    def forward(self, x_fusion, x_image, x_audio):
        xmm = self.norm1_mm(x_fusion)
        if self.arch == "token":
            # swapped-norm quirk: img-norm on audio, aud-norm on image
            src = torch.cat([self.norm1_img(x_audio), self.norm1_aud(x_image)], dim=1)
            res = self.attn(xmm, src)
        elif self.arch == "dense_mmi":
            xv = self.norm1_img(x_image)
            xa = self.norm1_aud(x_audio)
            res = self.attn(xmm, pairs(xa, xv))  # audio-major pairs
        else:
            res = self.attn(xmm, self.norm1_img(x_image), self.norm1_aud(x_audio))
        xmm = xmm + res  # residual on NORMALIZED tokens
        xmm = xmm + self.mlp(self.norm2(xmm))
        return xmm


class OracleTrunk(nn.Module):
    def __init__(
        self, image_size=(32, 32), audio_size=(16, 48), dim=48, depth=3, heads=4,
        arch="factorized_mmi", tkns=(4, 2, 2), attn_ratio=0.25, fusion_mlp_ratio=1.0,
        fusion_heads=4,
    ):
        super().__init__()
        self.image = OracleViT(image_size, (16, 16), 3, dim, depth, heads)
        self.audio = OracleViT(audio_size, (16, 16), 1, dim, depth, heads)
        self.tkns = tkns
        self.fusion_tokens = nn.Parameter(torch.randn(1, sum(tkns), dim) * 0.02)
        self.fusion_blocks = nn.ModuleList(
            [
                OracleFusionBlock(dim, fusion_heads, arch, attn_ratio, fusion_mlp_ratio, tkns)
                for _ in range(depth)
            ]
        )
        self.fusion_norm = nn.LayerNorm(dim)

    def forward(self, image, audio, image_ids_keep=None, audio_ids_keep=None,
                return_embs=False):
        B = image.shape[0]
        x_image = self.image.prepare(image, image_ids_keep)
        x_audio = self.audio.prepare(audio, audio_ids_keep)
        nF = self.fusion_tokens.shape[1]
        x_fusion = self.fusion_tokens.expand(B, -1, -1)
        embs = []
        for bi, ba, bf in zip(self.image.blocks, self.audio.blocks, self.fusion_blocks):
            _xi = bi(torch.cat([x_fusion, x_image], 1))[:, nF:]
            _xa = ba(torch.cat([x_fusion, x_audio], 1))[:, nF:]
            x_fusion = bf(x_fusion, x_image, x_audio)
            x_image, x_audio = _xi, _xa
            embs.append((x_image, x_audio, x_fusion))
        out = (self.image.norm(x_image), self.audio.norm(x_audio),
               self.fusion_norm(x_fusion))
        return out + (embs,) if return_embs else out


class OracleAVMAE(nn.Module):
    """Reference AVMAE decoder semantics over the oracle trunk ('plain' arch)."""

    def __init__(self, trunk: OracleTrunk, dec_dim=32, dec_depth=2, dec_heads=4):
        super().__init__()
        self.encoder = trunk
        dim = trunk.fusion_norm.weight.shape[0]
        for mod, grid, pdim in (
            ("image", trunk.image.grid, 16 * 16 * 3),
            ("audio", trunk.audio.grid, 16 * 16 * 1),
        ):
            setattr(self, f"{mod}_decoder_embed", nn.Linear(dim, dec_dim))
            setattr(self, f"{mod}_decoder_mask_token",
                    nn.Parameter(torch.randn(1, 1, dec_dim) * 0.02))
            table = pe.sincos_2d(dec_dim, grid)[None]
            setattr(self, f"{mod}_decoder_pos_embed",
                    nn.Parameter(torch.from_numpy(table.copy())))
            setattr(self, f"{mod}_decoder_blocks", nn.ModuleList(
                [OracleBlock(dec_dim, dec_heads, 4.0, eps=1e-5) for _ in range(dec_depth)]
            ))
            setattr(self, f"{mod}_decoder_norm", nn.LayerNorm(dec_dim))
            setattr(self, f"{mod}_decoder_pred", nn.Linear(dec_dim, pdim))

    def decode(self, x, x_fusion, ids_restore, modality):
        bs, nF = x.shape[0], x_fusion.shape[1]
        n_mask = ids_restore.shape[1] - x.shape[1]
        embed = getattr(self, f"{modality}_decoder_embed")
        x, x_fusion = embed(x), embed(x_fusion)
        mask_token = getattr(self, f"{modality}_decoder_mask_token")
        x = torch.cat([x, mask_token.expand(bs, n_mask, -1)], dim=1)
        x = x.gather(1, ids_restore[:, :, None].expand(-1, -1, x.shape[-1]))
        x = x + getattr(self, f"{modality}_decoder_pos_embed")
        x = torch.cat([x_fusion, x], dim=1)
        for blk in getattr(self, f"{modality}_decoder_blocks"):
            x = blk(x)
        x = x[:, nF:]
        norm = getattr(self, f"{modality}_decoder_norm")
        pred = getattr(self, f"{modality}_decoder_pred")
        return pred(norm(x))
