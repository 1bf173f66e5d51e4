def _cfg(url="", **kw):
    return {"url": url, **kw}
