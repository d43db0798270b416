"""Literal torch restatement of the UniMatch (GMFlow scale2-regrefine6)
inference graph — the golden model for converter + forward parity of
videoswap_tpu/preprocess/unimatch.py (same role as the torch body model
in tests/test_pose.py). Module attribute names reproduce the public
checkpoint key set (backbone.*, transformer.layers.N.*,
feature_flow_attn.*, refine_proj.*, refine.*)."""

import torch
import torch.nn as nn
import torch.nn.functional as F


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


class MultiScaleTridentConv(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.weight = nn.Parameter(torch.empty(out_ch, in_ch, 3, 3))
        nn.init.kaiming_uniform_(self.weight, a=1)

    def forward(self, x):
        return [F.conv2d(x, self.weight, None, stride, 1)
                for stride in (1, 2)]


class CNNEncoder(nn.Module):
    def __init__(self, output_dim=128):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        self.norm1 = nn.InstanceNorm2d(64)
        self.relu1 = nn.ReLU(inplace=True)
        self.layer1 = nn.Sequential(ResidualBlock(64, 64),
                                    ResidualBlock(64, 64))
        self.layer2 = nn.Sequential(ResidualBlock(64, 96, stride=2),
                                    ResidualBlock(96, 96))
        self.layer3 = nn.Sequential(ResidualBlock(96, 128, stride=1),
                                    ResidualBlock(128, 128))
        self.conv2 = nn.Conv2d(128, output_dim, 1)
        self.trident_conv = MultiScaleTridentConv(output_dim, output_dim)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.conv2(x)
        quarter, eighth = self.trident_conv(x)
        return [eighth, quarter]        # coarse to fine


def split_feature(x, num_splits):
    # channel-last (B, H, W, C)
    b, h, w, c = x.shape
    x = x.view(b, num_splits, h // num_splits, num_splits,
               w // num_splits, c).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(b * num_splits ** 2, h // num_splits,
                     w // num_splits, c)


def merge_splits(x, num_splits):
    bkk, hh, ww, c = x.shape
    b = bkk // num_splits ** 2
    x = x.view(b, num_splits, num_splits, hh, ww, c).permute(
        0, 1, 3, 2, 4, 5)
    return x.reshape(b, num_splits * hh, num_splits * ww, c)


def shift_window_attn_mask(h, w, win_h, win_w, shift_h, shift_w):
    img = torch.zeros(1, h, w, 1)
    cnt = 0
    for hs in (slice(0, -win_h), slice(-win_h, -shift_h),
               slice(-shift_h, None)):
        for ws in (slice(0, -win_w), slice(-win_w, -shift_w),
                   slice(-shift_w, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    wins = split_feature(img, w // win_w).view(-1, win_h * win_w)
    mask = wins.unsqueeze(1) - wins.unsqueeze(2)
    return mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)


def window_attention(q, k, v, num_splits, with_shift, h, w, attn_mask):
    b, _, c = q.size()
    win_h, win_w = h // num_splits, w // num_splits
    q = q.view(b, h, w, c)
    k = k.view(b, h, w, c)
    v = v.view(b, h, w, c)
    if with_shift:
        sh, sw = win_h // 2, win_w // 2
        q = torch.roll(q, (-sh, -sw), dims=(1, 2))
        k = torch.roll(k, (-sh, -sw), dims=(1, 2))
        v = torch.roll(v, (-sh, -sw), dims=(1, 2))
    qs = split_feature(q, num_splits).view(-1, win_h * win_w, c)
    ks = split_feature(k, num_splits).view(-1, win_h * win_w, c)
    vs = split_feature(v, num_splits).view(-1, win_h * win_w, c)
    scores = torch.matmul(qs, ks.transpose(1, 2)) / (c ** 0.5)
    if with_shift:
        scores = scores + attn_mask.repeat(b, 1, 1)
    out = torch.matmul(torch.softmax(scores, -1), vs)
    out = merge_splits(out.view(-1, win_h, win_w, c), num_splits)
    if with_shift:
        out = torch.roll(out, (win_h // 2, win_w // 2), dims=(1, 2))
    return out.view(b, -1, c)


class TransformerLayer(nn.Module):
    def __init__(self, d_model=128, no_ffn=False, ffn_dim_expansion=4):
        super().__init__()
        self.no_ffn = no_ffn
        self.q_proj = nn.Linear(d_model, d_model)
        self.k_proj = nn.Linear(d_model, d_model)
        self.v_proj = nn.Linear(d_model, d_model)
        self.merge = nn.Linear(d_model, d_model)
        self.norm1 = nn.LayerNorm(d_model)
        if not no_ffn:
            in_ch = d_model * 2
            self.mlp = nn.Sequential(
                nn.Linear(in_ch, in_ch * ffn_dim_expansion, bias=False),
                nn.GELU(),
                nn.Linear(in_ch * ffn_dim_expansion, d_model, bias=False))
            self.norm2 = nn.LayerNorm(d_model)

    def forward(self, source, target, h, w, splits, with_shift, attn_mask):
        q = self.q_proj(source)
        k = self.k_proj(target)
        v = self.v_proj(target)
        if splits > 1:
            message = window_attention(q, k, v, splits, with_shift, h, w,
                                       attn_mask)
        else:
            c = q.size(-1)
            scores = torch.matmul(q, k.transpose(1, 2)) / (c ** 0.5)
            message = torch.matmul(torch.softmax(scores, -1), v)
        message = self.norm1(self.merge(message))
        if not self.no_ffn:
            message = self.norm2(self.mlp(
                torch.cat([source, message], dim=-1)))
        return source + message


class TransformerBlock(nn.Module):
    def __init__(self, d_model=128, ffn_dim_expansion=4):
        super().__init__()
        self.self_attn = TransformerLayer(d_model, no_ffn=True)
        self.cross_attn_ffn = TransformerLayer(
            d_model, ffn_dim_expansion=ffn_dim_expansion)

    def forward(self, source, target, h, w, splits, with_shift, attn_mask):
        source = self.self_attn(source, source, h, w, splits, with_shift,
                                attn_mask)
        return self.cross_attn_ffn(source, target, h, w, splits,
                                   with_shift, attn_mask)


class FeatureTransformer(nn.Module):
    def __init__(self, num_layers=6, d_model=128, ffn_dim_expansion=4):
        super().__init__()
        self.layers = nn.ModuleList(
            TransformerBlock(d_model, ffn_dim_expansion)
            for _ in range(num_layers))

    def forward(self, feature0, feature1, splits):
        # (B, C, H, W) pair
        b, c, h, w = feature0.shape
        mask = None
        if splits > 1:
            mask = shift_window_attn_mask(
                h, w, h // splits, w // splits,
                h // splits // 2, w // splits // 2)
        f0 = feature0.flatten(-2).permute(0, 2, 1)
        f1 = feature1.flatten(-2).permute(0, 2, 1)
        concat0 = torch.cat([f0, f1], dim=0)
        concat1 = torch.cat([f1, f0], dim=0)
        for i, layer in enumerate(self.layers):
            with_shift = splits > 1 and i % 2 == 1
            concat0 = layer(concat0, concat1, h, w, splits, with_shift,
                            mask)
            concat1 = torch.cat(concat0.chunk(2, dim=0)[::-1], dim=0)
        f0, f1 = concat0.chunk(2, dim=0)
        f0 = f0.permute(0, 2, 1).view(b, c, h, w)
        f1 = f1.permute(0, 2, 1).view(b, c, h, w)
        return f0, f1


class SelfAttnPropagation(nn.Module):
    def __init__(self, in_channels=128):
        super().__init__()
        self.q_proj = nn.Linear(in_channels, in_channels)
        self.k_proj = nn.Linear(in_channels, in_channels)

    def forward(self, feature0, flow, local_window_radius):
        b, c, h, w = feature0.size()
        if local_window_radius <= 0:
            query = feature0.view(b, c, h * w).permute(0, 2, 1)
            query = self.q_proj(query)
            key = self.k_proj(query)
            value = flow.view(b, flow.size(1), h * w).permute(0, 2, 1)
            scores = torch.matmul(query, key.permute(0, 2, 1)) / (c ** 0.5)
            out = torch.matmul(torch.softmax(scores, dim=-1), value)
            return out.view(b, h, w, value.size(-1)).permute(0, 3, 1, 2)
        r = local_window_radius
        ksz = 2 * r + 1
        vdim = flow.size(1)
        q = self.q_proj(feature0.view(b, c, -1).permute(0, 2, 1)).reshape(
            b * h * w, 1, c)
        kmap = self.k_proj(feature0.view(b, c, -1).permute(
            0, 2, 1)).permute(0, 2, 1).reshape(b, c, h, w)
        k_win = F.unfold(kmap, ksz, padding=r).view(
            b, c, ksz ** 2, h, w).permute(0, 3, 4, 1, 2).reshape(
            b * h * w, c, ksz ** 2)
        v_win = F.unfold(flow, ksz, padding=r).view(
            b, vdim, ksz ** 2, h, w).permute(0, 3, 4, 2, 1).reshape(
            b * h * w, ksz ** 2, vdim)
        scores = torch.matmul(q, k_win) / (c ** 0.5)
        out = torch.matmul(torch.softmax(scores, dim=-1), v_win)
        return out.view(b, h, w, vdim).permute(0, 3, 1, 2)


def coords_grid(b, h, w):
    ys, xs = torch.meshgrid(torch.arange(h).float(),
                            torch.arange(w).float(), indexing='ij')
    return torch.stack([xs, ys], dim=0)[None].repeat(b, 1, 1, 1)


def grid_sample_px(img, coords):
    """img (B, C, H, W); coords (B, N, K, 2) pixel (x, y) ->
    (B, C, N, K), align_corners=True, zeros padding."""
    h, w = img.shape[-2:]
    gx = 2 * coords[..., 0] / (w - 1) - 1
    gy = 2 * coords[..., 1] / (h - 1) - 1
    grid = torch.stack([gx, gy], dim=-1)
    return F.grid_sample(img, grid, mode='bilinear', padding_mode='zeros',
                         align_corners=True)


def flow_warp(feature, flow):
    b, c, h, w = feature.shape
    grid = coords_grid(b, h, w) + flow          # (B, 2, H, W)
    coords = grid.permute(0, 2, 3, 1).reshape(b, h, w * 1, 2).view(
        b, h, w, 2)
    return grid_sample_px(feature, coords.view(b, h * w, 1, 2)).view(
        b, c, h, w)


def global_correlation_softmax_bidir(f0, f1):
    b, c, h, w = f0.shape
    f0f = f0.view(b, c, -1).permute(0, 2, 1)
    f1f = f1.view(b, c, -1)
    corr = torch.matmul(f0f, f1f).view(b, h * w, h * w) / (c ** 0.5)
    corr = torch.cat([corr, corr.permute(0, 2, 1)], dim=0)
    grid = coords_grid(1, h, w).view(1, 2, -1).permute(0, 2, 1).repeat(
        2 * b, 1, 1)
    prob = F.softmax(corr, dim=-1)
    correspondence = torch.matmul(prob, grid).view(
        2 * b, h, w, 2).permute(0, 3, 1, 2)
    return correspondence - coords_grid(2 * b, h, w)


def window_offsets(radius):
    r = torch.arange(-radius, radius + 1).float()
    dy, dx = torch.meshgrid(r, r, indexing='ij')
    return torch.stack([dx.reshape(-1), dy.reshape(-1)], dim=-1)


def local_correlation_softmax(f0, f1, radius):
    b, c, h, w = f0.size()
    coords = coords_grid(b, h, w).view(b, 2, -1).permute(0, 2, 1)
    offs = window_offsets(radius)                     # (K, 2)
    sample = coords.unsqueeze(-2) + offs              # (B, HW, K, 2)
    valid = ((sample[..., 0] >= 0) & (sample[..., 0] < w)
             & (sample[..., 1] >= 0) & (sample[..., 1] < h))
    window = grid_sample_px(f1, sample).permute(0, 2, 1, 3)  # (B,HW,C,K)
    f0v = f0.permute(0, 2, 3, 1).view(b, h * w, 1, c)
    corr = torch.matmul(f0v, window).view(b, h * w, -1) / (c ** 0.5)
    corr = corr.masked_fill(~valid, -1e9)
    prob = F.softmax(corr, dim=-1)
    correspondence = torch.matmul(prob.unsqueeze(-2), sample).squeeze(
        -2).view(b, h, w, 2).permute(0, 3, 1, 2)
    return correspondence - coords_grid(b, h, w)


def local_correlation_with_flow(f0, f1, flow, radius):
    b, c, h, w = f0.size()
    coords = coords_grid(b, h, w).view(b, 2, -1).permute(0, 2, 1)
    offs = window_offsets(radius)
    sample = (coords.unsqueeze(-2) + offs
              + flow.view(b, 2, -1).permute(0, 2, 1).unsqueeze(-2))
    window = grid_sample_px(f1, sample).permute(0, 2, 1, 3)
    f0v = f0.permute(0, 2, 3, 1).view(b, h * w, 1, c)
    corr = torch.matmul(f0v, window).view(b, h * w, -1) / (c ** 0.5)
    return corr.view(b, h, w, -1).permute(0, 3, 1, 2)


def position_embedding_sine(h, w, num_pos_feats=64, temperature=10000.0):
    import math
    scale = 2 * math.pi
    ones = torch.ones(1, h, w)
    y_embed = ones.cumsum(1)
    x_embed = ones.cumsum(2)
    y_embed = y_embed / (y_embed[:, -1:, :] + 1e-6) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + 1e-6) * scale
    dim_t = torch.arange(num_pos_feats).float()
    dim_t = temperature ** (2 * (torch.div(dim_t, 2, rounding_mode='floor'))
                            / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()),
                        dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()),
                        dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)  # (1,C,H,W)


def feature_add_position(f0, f1, splits, channels):
    if splits > 1:
        f0s = split_feature(f0.permute(0, 2, 3, 1), splits)
        f1s = split_feature(f1.permute(0, 2, 3, 1), splits)
        pos = position_embedding_sine(f0s.size(1), f0s.size(2),
                                      channels // 2).permute(0, 2, 3, 1)
        f0 = merge_splits(f0s + pos, splits).permute(0, 3, 1, 2)
        f1 = merge_splits(f1s + pos, splits).permute(0, 3, 1, 2)
    else:
        pos = position_embedding_sine(f0.size(2), f0.size(3), channels // 2)
        f0 = f0 + pos
        f1 = f1 + pos
    return f0, f1


class FlowHead(nn.Module):
    def __init__(self, input_dim=128, hidden_dim=256, out_dim=2):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dim, out_dim, 3, padding=1)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.conv2(self.relu(self.conv1(x)))


class SepConvGRU(nn.Module):
    def __init__(self, hidden_dim=128, input_dim=256):
        super().__init__()
        hi = hidden_dim + input_dim
        self.convz1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(hi, hidden_dim, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(hi, hidden_dim, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz1(hx))
        r = torch.sigmoid(self.convr1(hx))
        q = torch.tanh(self.convq1(torch.cat([r * h, x], dim=1)))
        h = (1 - z) * h + z * q
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz2(hx))
        r = torch.sigmoid(self.convr2(hx))
        q = torch.tanh(self.convq2(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    def __init__(self, corr_channels=81, flow_dim=2):
        super().__init__()
        self.convc1 = nn.Conv2d(corr_channels, 256, 1, padding=0)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(flow_dim, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, 128 - flow_dim, 3, padding=1)

    def forward(self, flow, corr):
        cor = F.relu(self.convc1(corr))
        cor = F.relu(self.convc2(cor))
        flo = F.relu(self.convf1(flow))
        flo = F.relu(self.convf2(flo))
        out = F.relu(self.conv(torch.cat([cor, flo], dim=1)))
        return torch.cat([out, flow], dim=1)


class BasicUpdateBlock(nn.Module):
    def __init__(self, corr_channels=81, hidden_dim=128, context_dim=128,
                 downsample_factor=4, flow_dim=2):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_channels, flow_dim)
        self.gru = SepConvGRU(hidden_dim, context_dim + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, 256, flow_dim)
        self.mask = nn.Sequential(
            nn.Conv2d(hidden_dim, 256, 3, padding=1),
            nn.ReLU(inplace=True),
            nn.Conv2d(256, downsample_factor ** 2 * 9, 1, padding=0))

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        inp = torch.cat([inp, motion], dim=1)
        net = self.gru(net, inp)
        return net, self.mask(net), self.flow_head(net)


def upsample_flow_with_mask(flow, mask, factor):
    b, ch, h, w = flow.shape
    mask = mask.view(b, 1, 9, factor, factor, h, w)
    mask = torch.softmax(mask, dim=2)
    up = F.unfold(factor * flow, [3, 3], padding=1)
    up = up.view(b, ch, 9, 1, 1, h, w)
    up = torch.sum(mask * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    return up.reshape(b, ch, factor * h, factor * w)


class TorchUniMatch(nn.Module):
    """The scale2-regrefine6 flow config with the reference's inference
    knobs baked in (attn_splits [2,8], corr radius [-1,4], prop [-1,1],
    bidir)."""

    def __init__(self, num_reg_refine=6):
        super().__init__()
        self.num_reg_refine = num_reg_refine
        self.backbone = CNNEncoder(128)
        self.transformer = FeatureTransformer(6, 128, 4)
        self.feature_flow_attn = SelfAttnPropagation(128)
        self.refine_proj = nn.Conv2d(128, 256, 1)
        self.refine = BasicUpdateBlock(corr_channels=81,
                                       downsample_factor=4)

    def forward(self, img0, img1):
        b = img0.size(0)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        feats = self.backbone(
            (torch.cat([img0, img1], dim=0) / 255.0 - mean) / std)
        f0_list = [f[:b] for f in feats]
        f1_list = [f[b:] for f in feats]
        attn_splits = (2, 8)
        corr_radius = (-1, 4)
        prop_radius = (-1, 1)
        flow = None
        for scale_idx in range(2):
            f0, f1 = f0_list[scale_idx], f1_list[scale_idx]
            if scale_idx > 0:
                f0, f1 = (torch.cat([f0, f1], dim=0),
                          torch.cat([f1, f0], dim=0))
            f0_ori, f1_ori = f0, f1
            if scale_idx > 0:
                flow = F.interpolate(flow, scale_factor=2, mode='bilinear',
                                     align_corners=True) * 2
                f1 = flow_warp(f1, flow)
            f0, f1 = feature_add_position(f0, f1, attn_splits[scale_idx],
                                          128)
            f0, f1 = self.transformer(f0, f1, attn_splits[scale_idx])
            if corr_radius[scale_idx] == -1:
                flow_pred = global_correlation_softmax_bidir(f0, f1)
            else:
                flow_pred = local_correlation_softmax(
                    f0, f1, corr_radius[scale_idx])
            flow = flow_pred if flow is None else flow + flow_pred
            if scale_idx == 0:
                f0 = torch.cat([f0, f1], dim=0)
            flow = self.feature_flow_attn(f0, flow,
                                          prop_radius[scale_idx])
            if scale_idx == 1:
                proj = self.refine_proj(f0)
                net, inp = torch.chunk(proj, 2, dim=1)
                net = torch.tanh(net)
                inp = torch.relu(inp)
                for _ in range(self.num_reg_refine):
                    corr = local_correlation_with_flow(f0_ori, f1_ori,
                                                       flow, 4)
                    net, up_mask, delta = self.refine(net, inp, corr, flow)
                    flow = flow + delta
                flow = upsample_flow_with_mask(flow, up_mask, 4)
        return flow
