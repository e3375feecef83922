"""Build-on-demand loader for the native/ C++ host components.

One shared implementation of the dlopen-or-make pattern (used by
coco_mask.py for libmaskapi.so and native_tokenizer.py for
libwordpiece.so). The auto-build is serialized by an flock: N forked
loader workers importing concurrently must not run parallel `make`s
rewriting the .so one of them is about to dlopen.
"""

from __future__ import annotations

import ctypes
import logging
import os

logger = logging.getLogger(__name__)


def load_native_lib(so_name):
    """dlopen native/{so_name}, building via `make -C native` if absent.

    Returns the CDLL, or None when the library is unavailable and cannot
    be built (callers fall back to their pure-Python paths).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    native_dir = os.path.join(here, "..", "..", "native")
    candidates = [
        os.path.join(native_dir, so_name),
        os.path.join(here, so_name),
    ]
    if not any(os.path.exists(c) for c in candidates) \
            and os.path.exists(os.path.join(native_dir, "Makefile")):
        import subprocess

        lock_path = os.path.join(native_dir, ".build.lock")
        try:
            import fcntl

            with open(lock_path, "w") as lock_f:
                fcntl.flock(lock_f, fcntl.LOCK_EX)
                if not any(os.path.exists(c) for c in candidates):
                    proc = subprocess.run(["make", "-C", native_dir],
                                          check=False, capture_output=True,
                                          text=True)
                    if proc.returncode != 0:
                        logger.warning(
                            "native build failed (%s; pure-Python fallbacks "
                            "will be used):\n%s", so_name,
                            proc.stderr[-2000:])
        except OSError:
            pass  # read-only tree: rely on a prebuilt .so or fallbacks
    for c in candidates:
        if os.path.exists(c):
            return ctypes.CDLL(c)
    return None
