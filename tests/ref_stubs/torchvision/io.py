def _read_video_from_memory(*a, **kw):
    raise NotImplementedError("torchvision stub")


def _probe_video_from_memory(*a, **kw):
    raise NotImplementedError("torchvision stub")
