"""Fetch stage: manifest integrity and offline (no-egress) behavior."""
import json

import numpy as np

from bumpcosmology_tpu.data import fetch as F


def test_manifest_covers_reference_inputs():
    # 33 GWTC-2.1 + 23 GWTC-3 PE releases + 1 injection file (showyourwork.yml:27-94)
    assert len(F.ZENODO_FILES) == 56
    assert sum(1 for r, n in F.ZENODO_FILES if "GWTC2p1" in n) == 33
    assert sum(1 for r, n in F.ZENODO_FILES if "GWTC3p0" in n) == 23
    assert F.INJECTION_FILE[1] == "endo3_bbhpop-LIGO-T2100113-v12.hdf5"
    names = [n for _, n in F.ZENODO_FILES]
    assert len(set(names)) == 56
    url = F.zenodo_url(*F.INJECTION_FILE)
    assert url.startswith("https://zenodo.org/record/7890437/")


def test_fetch_counts_present_and_failed_offline(tmp_path, monkeypatch):
    pe_dir = tmp_path / "pe-samples-raw"
    pe_dir.mkdir()
    inj = tmp_path / "endo3_bbhpop-LIGO-T2100113-v12.hdf5"

    # pre-place two PE files and the injection file; fail every download fast
    rng = np.random.default_rng(0)
    for _, name in F.ZENODO_FILES[:2]:
        (pe_dir / name).write_bytes(rng.bytes(64))
    inj.write_bytes(rng.bytes(64))

    def no_net(url, dest, timeout):
        raise OSError("no egress")

    monkeypatch.setattr(F, "_download", no_net)

    manifest = tmp_path / "input_manifest.json"
    counts = F.fetch_inputs(pe_dir, inj, manifest_out=str(manifest))
    assert counts == {"present": 3, "downloaded": 0, "failed": 54}

    entries = json.loads(manifest.read_text())["files"]
    assert len(entries) == 57
    by_status = [e for e in entries if e["status"] == "present"]
    assert len(by_status) == 3 and all(e["sha256"] for e in by_status)

    # resume: present files verify against the recorded checksums, nothing re-fetched
    counts2 = F.fetch_inputs(pe_dir, inj, manifest_out=str(manifest))
    assert counts2["present"] == 3

    # a torn file (checksum mismatch vs manifest) gets refetched — and with the
    # network still down, moves to failed instead of silently passing
    (pe_dir / F.ZENODO_FILES[0][1]).write_bytes(rng.bytes(64))
    counts3 = F.fetch_inputs(pe_dir, inj, manifest_out=str(manifest))
    assert counts3 == {"present": 2, "downloaded": 0, "failed": 55}
