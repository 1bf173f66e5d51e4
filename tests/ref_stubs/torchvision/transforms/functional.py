def resized_crop(*a, **kw):
    raise NotImplementedError("torchvision stub")


def resize(*a, **kw):
    raise NotImplementedError("torchvision stub")
