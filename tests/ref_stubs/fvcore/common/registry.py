"""fvcore Registry stub (same get/register surface)."""


class Registry:
    def __init__(self, name):
        self._name = name
        self._map = {}

    def register(self, obj=None, name=None):
        if obj is None:
            def deco(fn_or_class):
                self._map[name or fn_or_class.__name__] = fn_or_class
                return fn_or_class

            return deco
        self._map[name or obj.__name__] = obj
        return obj

    def get(self, name):
        if name not in self._map:
            raise KeyError(f"{name} not in {self._name} registry")
        return self._map[name]

    def __contains__(self, name):
        return name in self._map
