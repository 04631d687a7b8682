"""certified_curve: the canonical certified-accuracy-at-radius evaluation
over certification TSVs."""

import csv
import os.path as osp

import numpy as np

from certifyingfacerecognition_tpu.tools import certified_curve as cc


def _write_tsv(path, rows):
    with open(path, "w") as fh:
        fh.write("idx\tlabel\tpredict\tcorrect\tgap\tradius\ttime\n")
        for i, (correct, radius) in enumerate(rows):
            fh.write(f"{i}\t{i}\t{i if correct else -1}\t{int(correct)}\t"
                     f"1.0\t{radius}\t0:00\n")


def test_certified_accuracy_math():
    correct = np.array([True, True, False, True])
    radius = np.array([0.5, 1.0, 9.0, 0.0])
    radii = np.array([0.0, 0.4, 0.6, 1.1])
    acc = cc.certified_accuracy(correct, radius, radii)
    # r=0: 3/4 certified (abstain/mispredict rows never count);
    # r=0.4: {0.5, 1.0}; r=0.6: {1.0}; r=1.1: none.
    np.testing.assert_allclose(acc, [0.75, 0.5, 0.25, 0.0])


def test_cli_end_to_end(tmp_path):
    a = osp.join(tmp_path, "a.tsv")
    b = osp.join(tmp_path, "b.tsv")
    _write_tsv(a, [(True, 0.3), (True, 0.8), (False, 0.0)])
    _write_tsv(b, [(True, 0.1), (False, 0.0), (False, 0.0)])
    out = osp.join(tmp_path, "curve.csv")
    cc.main([a, b, "-o", out, "--radii", "0:1:0.5"])
    with open(out) as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == ["radius", "a.tsv", "b.tsv"]
    assert len(rows) == 4  # radii 0, 0.5, 1.0 + header
    # at r=0: a: 2/3, b: 1/3
    np.testing.assert_allclose([float(rows[1][1]), float(rows[1][2])],
                               [2 / 3, 1 / 3], rtol=1e-4)
    # at r=0.5: a: 1/3 (only 0.8), b: 0
    np.testing.assert_allclose([float(rows[2][1]), float(rows[2][2])],
                               [1 / 3, 0.0], rtol=1e-4, atol=1e-9)
