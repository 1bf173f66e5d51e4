"""Single-process NaiveSyncBatchNorm == plain BatchNorm."""
import torch.nn as nn


class NaiveSyncBatchNorm1d(nn.BatchNorm1d):
    def __init__(self, num_sync_devices=None, global_sync=False, **kw):
        kw.pop("process_group", None)
        super().__init__(**kw)


class NaiveSyncBatchNorm2d(nn.BatchNorm2d):
    def __init__(self, num_sync_devices=None, global_sync=False, **kw):
        kw.pop("process_group", None)
        super().__init__(**kw)


class NaiveSyncBatchNorm3d(nn.BatchNorm3d):
    def __init__(self, num_sync_devices=None, global_sync=False, **kw):
        kw.pop("process_group", None)
        super().__init__(**kw)
