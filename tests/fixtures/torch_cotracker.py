"""Literal torch restatement of the CoTracker v1 core (stride 4, window
8) — golden model for converter + forward parity of
videoswap_tpu/preprocess/cotracker_native.py. Module attribute names
reproduce the public `cotracker_stride_4_wind_8.pth` key set (fnet.*,
updateformer.{time,space}_blocks.N.*, norm.*, ffeat_updater.0.*,
vis_predictor.0.*)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

STRIDE = 4
LATENT = 128
RADIUS = 3
LEVELS = 4


class ResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride, 1)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1)
        self.norm1 = nn.InstanceNorm2d(planes)
        self.norm2 = nn.InstanceNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        if stride == 1 and in_planes == planes:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride),
                nn.InstanceNorm2d(planes))

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class BasicEncoder(nn.Module):
    def __init__(self, output_dim=LATENT, stride=STRIDE):
        super().__init__()
        self.stride = stride
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        self.norm1 = nn.InstanceNorm2d(64)
        self.relu1 = nn.ReLU(inplace=True)
        self.layer1 = nn.Sequential(ResidualBlock(64, 64),
                                    ResidualBlock(64, 64))
        self.layer2 = nn.Sequential(ResidualBlock(64, 96, 2),
                                    ResidualBlock(96, 96))
        self.layer3 = nn.Sequential(ResidualBlock(96, 128, 2),
                                    ResidualBlock(128, 128))
        self.layer4 = nn.Sequential(ResidualBlock(128, 128, 2),
                                    ResidualBlock(128, 128))
        self.conv2 = nn.Conv2d(64 + 96 + 128 + 128, output_dim * 2, 3,
                               padding=1)
        self.norm2 = nn.InstanceNorm2d(output_dim * 2)
        self.relu2 = nn.ReLU(inplace=True)
        self.conv3 = nn.Conv2d(output_dim * 2, output_dim, 1)

    def forward(self, x):
        _, _, H, W = x.shape
        x = self.relu1(self.norm1(self.conv1(x)))
        a = self.layer1(x)
        b = self.layer2(a)
        c = self.layer3(b)
        d = self.layer4(c)
        size = (H // self.stride, W // self.stride)
        a, b, c, d = (F.interpolate(t, size, mode='bilinear',
                                    align_corners=True)
                      for t in (a, b, c, d))
        x = self.conv2(torch.cat([a, b, c, d], dim=1))
        x = self.relu2(self.norm2(x))
        return self.conv3(x)


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                  C // self.num_heads).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU(approximate='tanh')
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class AttnBlock(nn.Module):
    def __init__(self, hidden_size=384, num_heads=8, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(hidden_size, elementwise_affine=False,
                                  eps=1e-6)
        self.attn = Attention(hidden_size, num_heads)
        self.norm2 = nn.LayerNorm(hidden_size, elementwise_affine=False,
                                  eps=1e-6)
        self.mlp = Mlp(hidden_size, int(hidden_size * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class UpdateFormer(nn.Module):
    def __init__(self, depth=6, input_dim=456, hidden_size=384,
                 num_heads=8, output_dim=LATENT + 2):
        super().__init__()
        self.input_transform = nn.Linear(input_dim, hidden_size)
        self.flow_head = nn.Linear(hidden_size, output_dim)
        self.time_blocks = nn.ModuleList(
            AttnBlock(hidden_size, num_heads) for _ in range(depth))
        self.space_blocks = nn.ModuleList(
            AttnBlock(hidden_size, num_heads) for _ in range(depth))

    def forward(self, x):
        # x: (B, N, T, D)
        x = self.input_transform(x)
        for i in range(len(self.time_blocks)):
            B, N, T, C = x.shape
            xt = x.reshape(B * N, T, C)
            xt = self.time_blocks[i](xt)
            x = xt.reshape(B, N, T, C)
            xs = x.permute(0, 2, 1, 3).reshape(B * T, N, C)
            xs = self.space_blocks[i](xs)
            x = xs.reshape(B, T, N, C).permute(0, 2, 1, 3)
        return self.flow_head(x)


def bilinear_sampler(img, coords):
    """RAFT-style: img (B, C, H, W), coords (B, ..., 2) pixel (x, y);
    align_corners=True, zeros padding."""
    H, W = img.shape[-2:]
    shape = coords.shape
    coords = coords.view(shape[0], -1, 1, 2)
    gx = 2 * coords[..., 0] / (W - 1) - 1
    gy = 2 * coords[..., 1] / (H - 1) - 1
    grid = torch.stack([gx, gy], dim=-1)
    out = F.grid_sample(img, grid, mode='bilinear', padding_mode='zeros',
                        align_corners=True)
    return out.view(img.shape[0], img.shape[1], *shape[1:-1])


def get_2d_embedding(xy, C=64):
    x, y = xy[..., 0:1], xy[..., 1:2]
    div = (torch.arange(0, C, 2, dtype=torch.float32)
           * (1000.0 / C)).to(xy.device)
    pe_x = torch.zeros(*xy.shape[:-1], C)
    pe_y = torch.zeros(*xy.shape[:-1], C)
    pe_x[..., 0::2] = torch.sin(x * div)
    pe_x[..., 1::2] = torch.cos(x * div)
    pe_y[..., 0::2] = torch.sin(y * div)
    pe_y[..., 1::2] = torch.cos(y * div)
    return torch.cat([xy, pe_x, pe_y], dim=-1)


def sincos_1d(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega = 1.0 / 10000 ** (omega / (embed_dim / 2.0))
    out = np.einsum('m,d->md', np.asarray(pos, np.float64).reshape(-1),
                    omega)
    return torch.from_numpy(np.concatenate(
        [np.sin(out), np.cos(out)], axis=1).astype(np.float32))


def pos_embed_2d(embed_dim, gh, gw):
    grid_w, grid_h = np.meshgrid(np.arange(gw, dtype=np.float32),
                                 np.arange(gh, dtype=np.float32))
    emb = np.concatenate([sincos_1d(embed_dim // 2, grid_w).numpy(),
                          sincos_1d(embed_dim // 2, grid_h).numpy()],
                         axis=1)
    return torch.from_numpy(emb.reshape(gh, gw, embed_dim))


class TorchCoTrackerCore(nn.Module):
    def __init__(self, iters=6):
        super().__init__()
        self.iters = iters
        self.fnet = BasicEncoder()
        self.updateformer = UpdateFormer()
        self.norm = nn.GroupNorm(1, LATENT)
        self.ffeat_updater = nn.Sequential(nn.Linear(LATENT, LATENT),
                                           nn.GELU())
        self.vis_predictor = nn.Sequential(nn.Linear(LATENT, 1))

    def forward_iteration(self, fmaps, coords_init, feat_init, vis_init,
                          track_mask):
        # fmaps (S, C, H, W); coords_init (S, N, 2) px; feat_init (N, C);
        # vis_init / track_mask (S, N)
        S, C, H, W = fmaps.shape
        N = coords_init.shape[1]
        coords = coords_init / STRIDE
        ffeats = feat_init[None].repeat(S, 1, 1)
        # correlation pyramid
        pyramid = [fmaps]
        x = fmaps
        for _ in range(LEVELS - 1):
            x = F.avg_pool2d(x, 2, stride=2)
            pyramid.append(x)
        r = RADIUS
        dy = torch.linspace(-r, r, 2 * r + 1)
        dx = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing='ij'),
                            dim=-1).reshape(-1, 2)     # first axis -> x

        pos_grid = pos_embed_2d(456, H, W).permute(2, 0, 1)[None]
        pos_embed = bilinear_sampler(
            pos_grid, coords[0][None]).permute(0, 2, 1)[0]   # (N, 456)
        times_embed = sincos_1d(456, np.arange(S))           # (S, 456)
        extra = torch.stack([track_mask.float(), vis_init.float()], -1)

        for _ in range(self.iters):
            fcorrs = []
            for i, fm in enumerate(pyramid):
                c_l = fm.shape[1]
                corr = torch.einsum('snc,schw->snhw',
                                    ffeats, fm) / (c_l ** 0.5)
                hh, ww = corr.shape[-2:]
                ctr = coords.reshape(S * N, 1, 2) / 2 ** i
                sample = ctr + delta[None]
                vals = bilinear_sampler(
                    corr.reshape(S * N, 1, hh, ww), sample)
                fcorrs.append(vals.reshape(S, N, -1))
            fcorrs = torch.cat(fcorrs, dim=-1)         # (S, N, 196)
            flows = coords - coords[0:1]
            flows_cat = get_2d_embedding(flows)        # (S, N, 130)
            tr_in = torch.cat([flows_cat, fcorrs, ffeats, extra], dim=-1)
            x_in = tr_in + pos_embed[None] + times_embed[:, None]
            delta_out = self.updateformer(
                x_in.permute(1, 0, 2)[None])[0].permute(1, 0, 2)
            coords = coords + delta_out[..., :2]
            dfeat = self.norm(delta_out[..., 2:].reshape(-1, LATENT))
            ffeats = ffeats + self.ffeat_updater(dfeat).reshape(
                S, N, LATENT)
        vis = self.vis_predictor(ffeats.reshape(-1, LATENT)).reshape(S, N)
        return coords * STRIDE, vis, ffeats
