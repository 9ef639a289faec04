"""Native (C++) runtime components.

`loader`: multithreaded libpng PNG decode + resize (see loader.cpp).  Gated:
`loader.available()` is False until the shared library is built
(`make -C medseg_tpu/native`), and all callers fall back to cv2/PIL.
"""
