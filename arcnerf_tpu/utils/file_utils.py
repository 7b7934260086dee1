"""Filesystem helpers (reference common/utils/file_utils.py:104)."""

import os
import shutil


def scan_dir(dir_path, suffix=None, recursive=False, full_path=False):
    """List files under dir_path, optionally filtered by suffix(es)."""
    if isinstance(suffix, str):
        suffix = (suffix,)
    results = []
    if recursive:
        for root, _, files in os.walk(dir_path):
            for f in files:
                if suffix is None or any(f.endswith(s) for s in suffix):
                    p = os.path.join(root, f)
                    results.append(p if full_path else os.path.relpath(p, dir_path))
    else:
        for f in sorted(os.listdir(dir_path)):
            p = os.path.join(dir_path, f)
            if os.path.isfile(p) and (suffix is None or any(f.endswith(s) for s in suffix)):
                results.append(p if full_path else f)
    return sorted(results)


def remove_if_exists(path):
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


def copy_files(src_dir, dst_dir, suffix=None):
    os.makedirs(dst_dir, exist_ok=True)
    for f in scan_dir(src_dir, suffix):
        shutil.copy2(os.path.join(src_dir, f), os.path.join(dst_dir, f))


def backup_source(src_root, dst_dir, exts=(".py", ".yaml")):
    """Snapshot source files into an experiment dir (config/backup parity
    with reference basic_trainer.py:131-138)."""
    for root, dirs, files in os.walk(src_root):
        dirs[:] = [d for d in dirs if d not in (".git", "__pycache__", "experiments", "results")]
        for f in files:
            if any(f.endswith(e) for e in exts):
                src = os.path.join(root, f)
                rel = os.path.relpath(src, src_root)
                dst = os.path.join(dst_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(src, dst)
