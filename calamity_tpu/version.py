"""Version and provenance info (reference parity: calamity/version.py)."""

from __future__ import annotations

import inspect
import json
import os
import subprocess

package_dir = os.path.dirname(os.path.realpath(__file__))

__version__ = "0.1.0"


def _get_git_output(args, capture_stderr=False):
    argv = ["git", "-C", package_dir] + args
    if capture_stderr:
        data = subprocess.check_output(argv, stderr=subprocess.STDOUT)
    else:
        data = subprocess.check_output(argv)
    return data.strip().decode("utf8")


def _get_gitinfo_file(git_file=None):
    if git_file is None:
        git_file = os.path.join(package_dir, "GIT_INFO")
    with open(git_file) as data_file:
        data = [x for x in json.loads(data_file.read().strip())]
    return {
        "git_origin": data[0],
        "git_hash": data[1],
        "git_description": data[2],
        "git_branch": data[3],
    }


def construct_version_info():
    version_info = {
        "version": __version__,
        "git_origin": "",
        "git_hash": "",
        "git_description": "",
        "git_branch": "",
    }
    try:
        version_info["git_origin"] = _get_git_output(
            ["config", "--get", "remote.origin.url"], capture_stderr=True
        )
        version_info["git_hash"] = _get_git_output(["rev-parse", "HEAD"], capture_stderr=True)
        version_info["git_description"] = _get_git_output(
            ["describe", "--dirty", "--tag", "--always"]
        )
        version_info["git_branch"] = _get_git_output(
            ["rev-parse", "--abbrev-ref", "HEAD"], capture_stderr=True
        )
    except (subprocess.CalledProcessError, OSError):  # pragma: no cover
        try:
            version_info.update(_get_gitinfo_file())
        except (IOError, OSError):
            pass
    return version_info


def history_string(notes=""):
    """Standardized provenance string for file headers."""
    stack = inspect.stack()
    caller = stack[1] if len(stack) > 1 else None
    history = "\n------------\nThis file was produced by the function "
    if caller is not None:
        history += str(caller[3]) + "() in " + os.path.basename(caller[1])
    history += " using: "
    version_info = construct_version_info()
    for v in sorted(version_info.keys()):
        history += "\n    " + v + ": " + str(version_info[v])
    if notes:
        history += "\n\nNotes:\n" + notes
    return history + "\n------------\n"


version_info = construct_version_info()
version = version_info["version"]
git_origin = version_info["git_origin"]
git_hash = version_info["git_hash"]
git_description = version_info["git_description"]
git_branch = version_info["git_branch"]


def main():  # pragma: no cover
    print(f"Version = {version}")
    print(f"git origin = {git_origin}")
    print(f"git branch = {git_branch}")
    print(f"git description = {git_description}")


if __name__ == "__main__":  # pragma: no cover
    main()
