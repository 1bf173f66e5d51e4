"""iopath stub: local-filesystem PathManager (test-only)."""


class PathManager:
    @staticmethod
    def open(path, mode="r", **kw):
        return open(path, mode)

    @staticmethod
    def exists(path):
        import os

        return os.path.exists(path)

    @staticmethod
    def mkdirs(path):
        import os

        os.makedirs(path, exist_ok=True)

    @staticmethod
    def ls(path):
        import os

        return os.listdir(path)

    @staticmethod
    def rm(path):
        import os

        os.remove(path)

    @staticmethod
    def copy(src, dst, **kw):
        import shutil

        shutil.copy(src, dst)
        return True

    @staticmethod
    def get_local_path(path, **kw):
        return path

    @staticmethod
    def register_handler(*a, **kw):
        pass


class PathManagerFactory:
    @staticmethod
    def get(key=None, **kw):
        return PathManager()


g_pathmgr = PathManager()
