def get_bn_modules(model):
    import torch.nn as nn

    return [
        m for m in model.modules()
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d))
    ]


def update_bn_stats(model, data_loader, num_iters=200):
    raise NotImplementedError("stub")
