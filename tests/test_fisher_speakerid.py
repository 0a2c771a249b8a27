"""fisher_fix_speakerid port: output verified byte-for-byte against the
reference perl script run on the same inputs (oracle outputs inlined)."""

import os

from loco_asr_tpu.data import fisher_speakerid, kaldi


def _write_inputs(d):
    open(os.path.join(d, "utt2spk"), "w").write(
        "fe_03_00001-A-000100-000200 fe_03_00001-A\n"
        "fe_03_00001-B-000300-000400 fe_03_00001-B\n"
        "fe_03_00002-A-000100-000200 fe_03_00002-A\n")
    open(os.path.join(d, "spk2gender"), "w").write(
        "fe_03_00001-A f\nfe_03_00001-B m\nfe_03_00002-A f\n")
    open(os.path.join(d, "segments"), "w").write(
        "fe_03_00001-A-000100-000200 fe_03_00001-A 1.00 2.00\n"
        "fe_03_00001-B-000300-000400 fe_03_00001-B 3.00 4.00\n"
        "fe_03_00002-A-000100-000200 fe_03_00002-A 1.00 2.00\n")
    open(os.path.join(d, "text"), "w").write(
        "fe_03_00001-A-000100-000200 hello world\n"
        "fe_03_00001-B-000300-000400 yes indeed\n"
        "fe_03_00002-A-000100-000200 missing conv\n")


def test_fix_speaker_ids_matches_perl_oracle(tmp_path):
    d = str(tmp_path)
    _write_inputs(d)
    calldata = ["00001,x,x,x,x, 777 ,x,x,x,x, 888 ,x\n"]
    missing = fisher_speakerid.fix_speaker_ids(
        fisher_speakerid.load_calldata(calldata), d, apply=False)
    assert missing == ["00002"]

    # oracle outputs from running the reference perl on identical inputs:
    assert open(os.path.join(d, "utt2spk.new")).read() == (
        "fe_03_777-00001-A-000100-000200 fe_03_777\n"
        "fe_03_888-00001-B-000300-000400 fe_03_888\n"
        "fe_03_00002-A-000100-000200 fe_03_00002-A\n")
    assert open(os.path.join(d, "segments.new")).read() == (
        "fe_03_777-00001-A-000100-000200 fe_03_00001-A 1.00 2.00\n"
        "fe_03_888-00001-B-000300-000400 fe_03_00001-B 3.00 4.00\n"
        "fe_03_00002-A-000100-000200 fe_03_00002-A 1.00 2.00\n")
    assert open(os.path.join(d, "spk2gender.new")).read() == (
        "fe_03_777 f\nfe_03_888 m\nfe_03_00002-A f\n")
    assert open(os.path.join(d, "text.new")).read() == (
        "fe_03_777-00001-A-000100-000200 hello world\n"
        "fe_03_888-00001-B-000300-000400 yes indeed\n"
        "fe_03_00002-A-000100-000200 missing conv\n")


def test_fix_speaker_ids_apply(tmp_path):
    d = str(tmp_path)
    _write_inputs(d)
    calldata = {"fe_03_00001-A": "777", "fe_03_00001-B": "888"}
    fisher_speakerid.fix_speaker_ids(calldata, d, apply=True)
    u2s = kaldi.read_key_value_file(os.path.join(d, "utt2spk"))
    assert u2s["fe_03_777-00001-A-000100-000200"] == "fe_03_777"
    s2u = kaldi.read_key_value_file(os.path.join(d, "spk2utt"))
    assert "fe_03_777" in s2u and "fe_03_888" in s2u
    assert os.path.exists(os.path.join(d, "text.old"))
