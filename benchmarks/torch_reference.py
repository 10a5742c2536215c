"""Torch-CPU reference mesh-recovery pipeline — the baseline denominator.

BASELINE.md: "the build session must measure the torch-CPU reference
baseline itself ... and record it as the denominator for the 5x target."
The reference repo's code is unavailable (empty mount, SURVEY.md section 0),
so this module reconstructs the same workload in torch: ResNet-50 encoder
-> 3-iteration IEF regressor -> SMPL forward -> weak-perspective projection,
eval mode, CPU. Written from the architecture spec (SURVEY.md section 2),
not copied from anywhere.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * self.expansion
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class TorchResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(3, stride=2, padding=1),
        )
        layers = []
        cin = 64
        for planes, blocks, stride in ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)):
            for b in range(blocks):
                layers.append(Bottleneck(cin, planes, stride if b == 0 else 1))
                cin = planes * 4
        self.body = nn.Sequential(*layers)

    def forward(self, x):
        x = self.body(self.stem(x))
        return x.mean(dim=(2, 3))  # (B, 2048)


class BasicBlockTorch(nn.Module):
    """Canonical basic block (ResNet-18/34), torchvision attribute naming."""

    expansion = 1

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + r)


class BottleneckTV(Bottleneck):
    """Bottleneck with torchvision's `downsample` attribute name."""

    def __init__(self, cin, planes, stride=1):
        super().__init__(cin, planes, stride)
        self.downsample, self.down = self.down, None

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


_TV_DEPTHS = {
    18: (BasicBlockTorch, (2, 2, 2, 2)),
    34: (BasicBlockTorch, (3, 4, 6, 3)),
    50: (BottleneckTV, (3, 4, 6, 3)),
    101: (BottleneckTV, (3, 4, 23, 3)),
}


class TorchResNetTV(nn.Module):
    """Torchvision-named ResNet of any depth (conv1/bn1/layer{1..4}/...).

    Stands in for real torchvision checkpoints (torchvision isn't in this
    image): state_dict keys match torchvision's exactly, so the importer's
    'torchvision' prefix style is tested end-to-end for every depth.
    """

    def __init__(self, depth: int = 18):
        super().__init__()
        block, stage_sizes = _TV_DEPTHS[depth]
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for i, (planes, blocks) in enumerate(zip((64, 128, 256, 512), stage_sizes)):
            stride = 1 if i == 0 else 2
            layer = []
            for b in range(blocks):
                layer.append(block(cin, planes, stride if b == 0 else 1))
                cin = planes * block.expansion
            setattr(self, f"layer{i + 1}", nn.Sequential(*layer))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in (1, 2, 3, 4):
            x = getattr(self, f"layer{i}")(x)
        return x.mean(dim=(2, 3))


class _TorchViTAttention(nn.Module):
    """timm-style fused-qkv attention (attribute names `qkv`, `proj`)."""

    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        H = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, H, D // H).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)  # each (B, H, N, hd)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(x)


class _TorchViTMLP(nn.Module):
    def __init__(self, dim: int, hidden: int):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()  # exact erf, matching models/vit.py
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _TorchViTBlock(nn.Module):
    def __init__(self, dim: int, num_heads: int, mlp_ratio: int):
        super().__init__()
        # timm ViT pins LayerNorm eps=1e-6 (not torch's 1e-5 default) —
        # matching flax's default, so the import is exact.
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchViTAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TorchViTMLP(dim, mlp_ratio * dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _PatchEmbed(nn.Module):
    def __init__(self, dim: int, patch_size: int):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch_size, stride=patch_size)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)  # (B, N, D)


class TorchViT(nn.Module):
    """timm-named ViT (cls_token/pos_embed/patch_embed.proj/blocks.{i}.…/norm).

    Stands in for real timm `vision_transformer` checkpoints (timm isn't in
    this image): state_dict keys match timm's exactly, so
    `utils/torch_import.import_torch_vit` is tested end-to-end against the
    checkpoint layout users of the HMR-2.0-style torch line actually hold.
    """

    def __init__(
        self,
        dim: int = 192,
        depth: int = 12,
        num_heads: int = 3,
        mlp_ratio: int = 4,
        patch_size: int = 16,
        img_size: int = 224,
    ):
        super().__init__()
        n = (img_size // patch_size) ** 2
        self.patch_embed = _PatchEmbed(dim, patch_size)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, dim))
        nn.init.normal_(self.cls_token, std=0.02)
        nn.init.normal_(self.pos_embed, std=0.02)
        self.blocks = nn.Sequential(
            *[_TorchViTBlock(dim, num_heads, mlp_ratio) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, pool: str = "cls"):
        x = self.patch_embed(x)
        B = x.shape[0]
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        x = self.norm(self.blocks(x))
        return x[:, 0] if pool == "cls" else x[:, 1:].mean(dim=1)


class TorchHMR(nn.Module):
    """Full reference-style pipeline: image -> theta/beta/cam -> mesh."""

    def __init__(self, smpl_oracle):
        super().__init__()
        self.encoder = TorchResNet50()
        self.fc1 = nn.Linear(2048 + 85, 1024)
        self.fc2 = nn.Linear(1024, 1024)
        self.out = nn.Linear(1024, 85)
        nn.init.normal_(self.out.weight, std=1e-2)
        nn.init.zeros_(self.out.bias)
        self.register_buffer("mean_params", torch.zeros(85))
        self.smpl = smpl_oracle

    def forward(self, images):
        B = images.shape[0]
        feat = self.encoder(images)
        params = self.mean_params.expand(B, -1)
        for _ in range(3):
            x = torch.relu(self.fc1(torch.cat([feat, params], dim=1)))
            x = torch.relu(self.fc2(x))
            params = params + self.out(x)
        theta, beta, cam = params[:, :72], params[:, 72:82], params[:, 82:]
        smpl_out = self.smpl(theta, beta)
        verts, joints = smpl_out["verts"], smpl_out["joints"]
        j2d = cam[:, None, 0:1] * (joints[:, :, :2] + cam[:, None, 1:3])
        return verts, joints, j2d


def measure_cpu_baseline(
    smpl_model, batch_size: int = 8, repeats: int = 5, threads: int | None = None
) -> float:
    """Images/sec of the torch-CPU reference pipeline (eval mode, no_grad)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tests.oracle_smpl_torch import SMPLOracle

    if threads is not None:
        torch.set_num_threads(threads)
    model = TorchHMR(SMPLOracle(smpl_model)).eval()
    images = torch.randn(batch_size, 3, 224, 224)
    with torch.no_grad():
        model(images)  # warmup
        import time

        t0 = time.perf_counter()
        for _ in range(repeats):
            model(images)
        dt = (time.perf_counter() - t0) / repeats
    return batch_size / dt
