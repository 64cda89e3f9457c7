def circle(*args, **kwargs):  # pragma: no cover — never called (see package doc)
    raise NotImplementedError(
        "skimage.draw.circle stub: the reference imports but never uses it")
