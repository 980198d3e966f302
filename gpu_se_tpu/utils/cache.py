"""PickleJar — machine-portable on-disk memoization of experiment results.

Re-creation of /root/reference/decorators.py:18-56: joblib memoization
keyed by function *name* (not module path) so caches ship across
machines, with ``force_same_code`` pinning the stored source to suppress
staleness invalidation and ``force_rerun`` to clear a single memo.
Cache root: ``<repo>/picklejar/<path>/``.
"""
from __future__ import annotations

import os

import joblib
import joblib.memory

global_cache_settings = {
    "force_rerun": False,
    "force_same_code": True,
}

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class PickleJar(joblib.memory.MemorizedFunc):
    """Disk-memoized function with machine-independent identity."""

    def __init__(self, func, location="", cache_settings=None, root=None):
        if cache_settings is None:
            cache_settings = global_cache_settings
        self.cache_settings = cache_settings

        joblib.memory._build_func_identifier = lambda f: f.__name__

        if root is None:
            root = os.environ.get(
                "GPU_SE_PICKLEJAR_ROOT", os.path.join(_REPO_ROOT, "picklejar")
            )
        location = os.path.join(root, location)
        super().__init__(func, location)

        # joblib drops a '.gitignore' with '*' into every cache dir it
        # creates — which silently keeps the campaign memos out of git.
        # The jar is MEANT to be committed (the reference ships its
        # results cache as a repo, /root/reference/README.md:22-38), so
        # scrub them.
        for dirpath, _dirs, files in os.walk(location):
            if ".gitignore" in files:
                try:
                    os.remove(os.path.join(dirpath, ".gitignore"))
                except OSError:
                    pass

        if self.cache_settings["force_same_code"]:
            func_code, source_file, first_line = joblib.memory.get_func_code(self.func)
            self._write_func_code(func_code, first_line)

    @staticmethod
    def pickle(path, root=None):
        """Decorator factory: ``@PickleJar.pickle('pf/raw')``. ``root``
        pins the cache directory regardless of GPU_SE_PICKLEJAR_ROOT
        (used by the committed parity cache, which tests must HIT)."""
        return lambda fun: PickleJar(fun, path, root=root)

    def clear_single(self, *args, **kwargs):
        """Drop the memo for one argument tuple."""
        self.call_and_shelve(*args, **kwargs).clear()

    def __call__(self, *args, **kwargs):
        if self.cache_settings["force_rerun"]:
            self.clear_single(*args, **kwargs)
        return super().__call__(*args, **kwargs)
