class ROIAlign:
    def __init__(self, *a, **kw):
        raise NotImplementedError("detectron2 stub: ROIAlign unavailable")
