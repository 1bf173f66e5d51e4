def make_grid(*a, **kw):
    raise NotImplementedError("torchvision stub")
