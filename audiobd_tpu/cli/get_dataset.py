"""Download Google Speech Commands v0.01 / v0.02 (reference get_dataset.py).

The reference shells out to torchaudio's SPEECHCOMMANDS downloader; this is a
stdlib urllib + tarfile implementation with resume-safe extraction into the
same ``data/SpeechCommands/speech_commands_v0.0X`` layout the data layer and
the reference both expect.
"""

from __future__ import annotations

import argparse
import os
import tarfile
import urllib.request

URLS = {
    "0.01": "https://storage.googleapis.com/download.tensorflow.org/data/speech_commands_v0.01.tar.gz",
    "0.02": "https://storage.googleapis.com/download.tensorflow.org/data/speech_commands_v0.02.tar.gz",
}


def download(version: str, root: str = "data") -> str:
    url = URLS[version]
    target_dir = os.path.join(root, "SpeechCommands", f"speech_commands_v{version}")
    if os.path.isdir(target_dir) and any(os.scandir(target_dir)):
        print(f"{target_dir} already populated, skipping")
        return target_dir
    os.makedirs(target_dir, exist_ok=True)
    archive = os.path.join(root, f"speech_commands_v{version}.tar.gz")
    if not os.path.exists(archive):
        print(f"downloading {url} ...")
        urllib.request.urlretrieve(url, archive)
    print(f"extracting to {target_dir} ...")
    with tarfile.open(archive) as tar:
        tar.extractall(target_dir, filter="data")
    return target_dir


def main():
    parser = argparse.ArgumentParser(description="Download Speech Commands")
    parser.add_argument("--version", choices=["0.01", "0.02", "both"], default="both")
    parser.add_argument("--root", type=str, default="data")
    args = parser.parse_args()
    versions = ["0.01", "0.02"] if args.version == "both" else [args.version]
    for version in versions:
        try:
            download(version, args.root)
        except Exception as e:
            print(f"download of v{version} failed ({e}); if this host has no "
                  f"egress, fetch the archive manually and place it at "
                  f"{args.root}/speech_commands_v{version}.tar.gz")


if __name__ == "__main__":
    main()
