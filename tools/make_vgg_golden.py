"""VGG19 converter/architecture golden.

torchvision is not installed and its pretrained weights are not
downloadable (zero egress), so this builds a torch VGG19 with EXACTLY
torchvision's module layout and state_dict key names (features.N.*,
classifier.N.*; cfg "E" conv stack + AdaptiveAvgPool2d(7,7) + 3-linear
classifier), seeds random weights, and records forward outputs. A real
user-supplied vgg19.pth has identical keys/shapes, so converter parity
on this fixture proves the real path.
"""

import os
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_torch_vgg19():
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_c, v, 3, padding=1), nn.ReLU(True)]
            in_c = v

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)
            self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = nn.Sequential(
                nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, 1000),
            )

        def forward(self, x):
            import torch

            x = self.features(x)
            x = self.avgpool(x)
            x = torch.flatten(x, 1)
            return self.classifier(x)

    return VGG()


def main():
    import torch

    torch.manual_seed(3)
    torch.set_grad_enabled(False)
    os.makedirs(OUT, exist_ok=True)

    net = build_torch_vgg19().eval()
    # shrink default-init weights so 19 layers don't blow up numerically
    sd = net.state_dict()
    for k, v in sd.items():
        sd[k] = v * 0.5 if k.endswith("weight") else v
    net.load_state_dict(sd)

    payload = {f"sd::{k}": v.numpy() for k, v in net.state_dict().items()}
    rng = np.random.RandomState(5)
    # 64: features 2x2 -> adaptive pool UP to 7x7; 96: 3x3 -> 7x7
    for name, hw in [("x64", 64), ("x96", 96)]:
        x = rng.rand(2, 3, hw, hw).astype(np.float32)
        payload[f"{name}_in"] = x
        payload[f"{name}_out"] = net(torch.from_numpy(x)).numpy()
        payload[f"{name}_feat"] = net.features(torch.from_numpy(x)).numpy()

    np.savez_compressed(os.path.join(OUT, "vgg19_golden.npz"), **payload)
    print("wrote", len(payload), "arrays")


if __name__ == "__main__":
    main()
