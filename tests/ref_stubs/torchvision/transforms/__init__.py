class _Unavailable:
    def __init__(self, *a, **kw):
        raise NotImplementedError("torchvision stub")


Compose = RandomHorizontalFlip = RandomVerticalFlip = ColorJitter = _Unavailable
ToTensor = Normalize = RandomResizedCrop = _Unavailable


class InterpolationMode:
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
