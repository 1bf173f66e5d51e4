"""Real soft-target CE (pytorchvideo semantics), single-file."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class SoftTargetCrossEntropyLoss(nn.Module):
    def __init__(self, reduction="mean", normalize_targets=True):
        super().__init__()
        self.reduction = reduction
        self.normalize_targets = normalize_targets

    def forward(self, x, y):
        y = y.float()
        if self.normalize_targets:
            y = y / y.sum(dim=-1, keepdim=True).clamp(min=1e-8)
        loss = torch.sum(-y * F.log_softmax(x, dim=-1), dim=-1)
        if self.reduction == "mean":
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        return loss
