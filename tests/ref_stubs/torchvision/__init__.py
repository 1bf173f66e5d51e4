"""torchvision stub: module attributes the reference touches at import."""
from . import io, transforms, utils  # noqa
