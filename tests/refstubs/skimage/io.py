def imread(*a, **k):  # pragma: no cover - never called by parity paths
    raise NotImplementedError("skimage stub: io.imread is not available")


def imsave(*a, **k):  # pragma: no cover
    raise NotImplementedError("skimage stub: io.imsave is not available")
