"""Converters for the NR-IQA stage's pretrained assets (egress-blocked here).

The reference acceptance protocol (``TFC-GAN-FFT/eval/Devcom/IQA.sh:13-28``)
scores fake_B/real_B with MANIQA, DBCNN and NIQE via IQA-PyTorch. In this
environment no weights can be downloaded, so (same pattern as
``tools/convert_lpips.py``):

- **NIQE** runs natively on a synthetic-fitted pristine model
  (``tools/fit_niqe_pristine.py``). To restore the *canonical* scores, obtain
  the authors' ``modelparameters.mat`` (125-natural-image model, shipped with
  matlab/IQA-PyTorch) on a networked machine and run
  ``python tools/convert_iqa.py --niqe-mat modelparameters.mat`` —
  it writes ``weights/niqe_pristine.npz``, which
  ``evaluation.niqe.load_pristine_model`` auto-discovers.
- **MANIQA / DBCNN** are learned models (ViT- and bilinear-CNN-based); their
  forward graphs are not reimplemented here because without checkpoints no
  parity harness can validate them. Score those two with IQA-PyTorch
  directly, or request a converter once weights can be provisioned.
"""

import argparse
import os

import numpy as np


def convert_niqe_mat(mat_path: str, out_path: str) -> None:
    from scipy import io as sio

    m = sio.loadmat(mat_path)
    # canonical fields: pop_mu (36,1) / pop_cov (36,36) — some releases name
    # them mu_prisparam / cov_prisparam
    mu = m.get("pop_mu", m.get("mu_prisparam"))
    cov = m.get("pop_cov", m.get("cov_prisparam"))
    if mu is None or cov is None:
        raise KeyError(f"unrecognized .mat fields: {sorted(m)}")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, mu=np.asarray(mu, np.float64).ravel(),
             cov=np.asarray(cov, np.float64))
    print(f"wrote {out_path} (mu {np.ravel(mu).shape}, cov {np.shape(cov)})")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--niqe-mat", help="path to canonical modelparameters.mat")
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.niqe_mat:
        convert_niqe_mat(args.niqe_mat, os.path.join(root, "weights", "niqe_pristine.npz"))
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
