def make_getattr(modname):
    def __getattr__(name):
        def _unavailable(*a, **kw):
            raise NotImplementedError(
                f"pytorchvideo stub: {modname}.{name} unavailable"
            )

        _unavailable.__name__ = name
        return _unavailable

    return __getattr__
