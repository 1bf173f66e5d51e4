from pmv_tpu.models.build import MODEL_REGISTRY, build_model  # noqa: F401

# Import model modules so their @MODEL_REGISTRY.register() decorators run.
from pmv_tpu.models import mvit  # noqa: F401
from pmv_tpu.models import uniformer  # noqa: F401
from pmv_tpu.models import x3d  # noqa: F401
from pmv_tpu.models import resnet  # noqa: F401
from pmv_tpu.models import avslowfast  # noqa: F401
from pmv_tpu.models import csn_r2plus1d  # noqa: F401
from pmv_tpu.models import contrastive  # noqa: F401
from pmv_tpu.models import masked  # noqa: F401

# PyTorchVideo-builder model names (`MViT/slowfast/models/ptv_model_builder.py`)
# alias the native implementations — same architectures, native flax modules.
# (PTVCSN / PTVR2plus1D are registered in csn_r2plus1d.py.) Note the
# reference's PTVR3D itself builds with create_r2plus1d + 2plus1d
# bottlenecks (`ptv_model_builder.py:707-790`), so it aliases R2Plus1D here.
from pmv_tpu.models.build import MODEL_REGISTRY as _REG
from pmv_tpu.models import csn_r2plus1d as _csn

_REG.register(resnet.build_resnet, name="PTVResNet")
_REG.register(resnet.build_slowfast, name="PTVSlowFast")
_REG.register(x3d.build_x3d, name="PTVX3D")
_REG.register(mvit.build_mvit, name="PTVMViT")
_REG.register(_csn._build_r2plus1d, name="PTVR3D")
