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
