"""PyTorch-CPU baseline for the headline benchmark.

The reference publishes no throughput numbers (BASELINE.md), so the
baseline is *measured*: a torch CPU implementation of the same workload
bench.py times on TPU — one FixMatch training step of a 1-D ResNet-18 +
FCN-head segmentor on (16, 1, 2500) batches: eval-mode pseudo-label
forward on the weak unlabeled view + train forward on concat(labeled,
strong) + backward + AdamW step (reference fixmatch.py:87-138 workload
shape, torch==CPU as in BASELINE.json's "PyTorch CPU baseline").

Run: ``python tools/bench_torch_baseline.py [--steps 20]`` → prints
samples/sec. The measured value is recorded in BASELINE.md and used as
``vs_baseline`` denominator by bench.py (env BASELINE_SAMPLES_PER_SEC
overrides).
"""

import argparse
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


def conv_bn(cin, cout, k=3, stride=1):
    return nn.Sequential(
        nn.Conv1d(cin, cout, k, stride=stride, padding=k // 2, bias=False),
        nn.BatchNorm1d(cout),
    )


class Block(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.a = conv_bn(cin, cout, stride=stride)
        self.b = conv_bn(cout, cout)
        self.down = (
            conv_bn(cin, cout, k=1, stride=stride)
            if stride != 1 or cin != cout else None
        )

    def forward(self, x):
        y = F.relu(self.a(x))
        y = self.b(y)
        idn = self.down(x) if self.down is not None else x
        return F.relu(y + idn)


class ResNet18Seg(nn.Module):
    def __init__(self, num_classes=4):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv1d(1, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm1d(64), nn.ReLU(),
            nn.MaxPool1d(3, stride=2, padding=1),
        )
        chans = [64, 128, 256, 512]
        strides = [1, 2, 2, 2]
        layers = []
        cin = 64
        for c, s in zip(chans, strides):
            layers += [Block(cin, c, s), Block(c, c)]
            cin = c
        self.layers = nn.Sequential(*layers)
        self.head = nn.Sequential(
            nn.Conv1d(512, 128, 3, padding=1, bias=False),
            nn.BatchNorm1d(128), nn.ReLU(), nn.Dropout(0.1),
            nn.Conv1d(128, num_classes, 1),
        )

    def forward(self, x):
        t = x.shape[-1]
        y = self.head(self.layers(self.stem(x)))
        return F.interpolate(y, size=t, mode="linear", align_corners=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--length", type=int, default=2500)
    args = ap.parse_args()

    torch.manual_seed(0)
    model = ResNet18Seg()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.05)

    b, t = args.batch, args.length
    ecg_x = torch.randn(b, 1, t)
    mask_x = torch.randint(0, 4, (b, t))
    ecg_u_w = torch.randn(b, 1, t)
    ecg_u_s = torch.randn(b, 1, t)

    def step():
        with torch.no_grad():
            model.eval()
            logits_w = model(ecg_u_w)
            prob = logits_w.softmax(1)
            conf, pseudo = prob.max(1)
        model.train()
        out = model(torch.cat([ecg_x, ecg_u_s]))
        px, pu = out.split([b, b])
        loss_x = F.cross_entropy(px, mask_x)
        loss_u = (F.cross_entropy(pu, pseudo, reduction="none")
                  * (conf >= 0.8)).mean()
        loss = (loss_x + loss_u) / 2
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(3):  # warmup
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0
    sps = args.steps * b / dt
    print(f"torch-cpu fixmatch: {dt / args.steps * 1000:.1f} ms/step, "
          f"{sps:.2f} samples/sec (batch {b}, len {t})")


if __name__ == "__main__":
    main()
