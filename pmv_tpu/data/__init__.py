from pmv_tpu.data.build import DATASET_REGISTRY, build_dataset  # noqa: F401


def _register_datasets():
    # Import for registry side effects.
    from pmv_tpu.data import ava  # noqa: F401
    from pmv_tpu.data import frame_datasets  # noqa: F401
    from pmv_tpu.data import kinetics  # noqa: F401
    from pmv_tpu.data import kinetics_av  # noqa: F401
    from pmv_tpu.data import synthetic  # noqa: F401


_register_datasets()
