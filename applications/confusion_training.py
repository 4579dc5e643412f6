"""DIPNet surrogate training driver for the confusion problem.

Port of `applications/confusion/dipnet_paper/confusion_training.py` +
`confusion_utilities.py` (reference): load the generated (m, q) data and the
AS/KLE/POD projectors, re-orthonormalize and rescale them, build the
projected network, train with l2 (+ optional H1 Jacobian-sketch) loss, and
report train/val accuracy.

Run after `applications/confusion_setup.py`:
    python applications/confusion_training.py --data_dir confusion_output/
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def load_confusion_data(data_dir: str):
    """Load consolidated (m, q) data (reference
    `confusion_utilities.py:18-112` concatenates per-rank files; here the
    DataGenerator already wrote one bundle)."""
    data = np.load(os.path.join(data_dir, "mq_data.npz"))
    return data["m_data"], data["q_data"]


def get_projectors(data_dir: str, as_input_tolerance=1e-4, pod_tolerance=1e-4,
                   fixed_input_rank=0, fixed_output_rank=0):
    """Load AS/KLE input and POD output bases with tolerance- or fixed-rank
    truncation (reference `confusion_utilities.py:115-172`)."""
    projectors = {}
    as_files = [f for f in os.listdir(data_dir) if f.endswith("_input_decoder.npy")]
    if as_files:
        AS_input = np.load(os.path.join(data_dir, sorted(as_files)[-1]))
        d_files = [f for f in os.listdir(data_dir) if f.endswith("_d_GN.npy")]
        if fixed_input_rank > 0:
            rank = fixed_input_rank
        else:
            d_GN = np.load(os.path.join(data_dir, sorted(d_files)[-1]))
            rank = max(1, int(np.sum(d_GN / max(d_GN[0], 1e-30) > as_input_tolerance)))
        projectors["AS_input"] = AS_input[:, :rank]
    if os.path.exists(os.path.join(data_dir, "KLE_decoder.npy")):
        KLE = np.load(os.path.join(data_dir, "KLE_decoder.npy"))
        rank = fixed_input_rank or KLE.shape[1]
        projectors["KLE"] = KLE[:, :rank]
    if os.path.exists(os.path.join(data_dir, "POD_projector.npy")):
        POD = np.load(os.path.join(data_dir, "POD_projector.npy"))
        d_files = os.path.join(data_dir, "POD_d.npy")
        if fixed_output_rank > 0:
            rank = fixed_output_rank
        else:
            d_POD = np.load(d_files)
            rank = max(1, int(np.sum(d_POD / max(d_POD[0], 1e-30) > pod_tolerance)))
        projectors["POD"] = POD[:, :rank]
    return projectors


def modify_projectors(projectors: dict, input_basis="AS_input"):
    """QR re-orthonormalization + rescaling (reference
    `confusion_utilities.py:174-227`). Returns (input_proj, output_proj).

    Input scale: Q / (dM/(32 r) * ||Q||_F); output: Phi_orth / ||Phi_orth||_F.
    """
    P = projectors[input_basis]
    Q, _ = np.linalg.qr(P)
    scale_in = float(Q.shape[0]) / (32.0 * float(Q.shape[1]))
    Q = Q / (scale_in * np.linalg.norm(Q))
    Phi, _ = np.linalg.qr(projectors["POD"])
    Phi = Phi / np.linalg.norm(Phi)
    return Q, Phi


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="confusion_output/")
    parser.add_argument("--architecture", type=str, default="as_dense",
                        choices=["as_dense", "kle_dense", "as_resnet", "generic_dense",
                                 "linear", "low_rank_linear"])
    parser.add_argument("--fixed_input_rank", type=int, default=8)
    parser.add_argument("--fixed_output_rank", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--n_data", type=int, default=0, help="0 = all")
    parser.add_argument("--h1_weight", type=float, default=0.0)
    parser.add_argument("--optimizer", type=str, default="adamw",
                        choices=["adamw", "incg"],
                        help="incg = inexact Newton-CG with line search and "
                             "rank-20 Hessian preconditioning (the reference "
                             "hessianlearn fit(), confusion_training.py:191-217)")
    parser.add_argument("--hessian_low_rank", type=int, default=20)
    parser.add_argument("--hess_batch_size", type=int, default=16)
    parser.add_argument("--record_spectrum", type=int, default=0,
                        help="log top-k GN Hessian eigenvalues per sweep "
                             "(incg only; reference record_spectrum)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--logger_out", type=str, default=None)
    args = parser.parse_args()

    import jax

    from hippyflow_tpu.nn import (
        GenericDense,
        GenericLinear,
        LowRankLinear,
        projected_dense,
        projected_low_rank_residual_network,
        train,
    )

    m_data, q_data = load_confusion_data(args.data_dir)
    if args.n_data:
        m_data, q_data = m_data[: args.n_data], q_data[: args.n_data]
    print(f"data: m {m_data.shape}, q {q_data.shape}")

    projectors = get_projectors(
        args.data_dir,
        fixed_input_rank=args.fixed_input_rank,
        fixed_output_rank=args.fixed_output_rank,
    )

    dM, dQ = m_data.shape[1], q_data.shape[1]
    if args.architecture in ("as_dense", "kle_dense", "as_resnet"):
        basis = "AS_input" if args.architecture.startswith("as") else "KLE"
        P, Phi = modify_projectors(projectors, basis)
        # center the regression on the training-data mean (hessianlearn's
        # RegressionProblem(y_mean=q_mean), confusion_training.py:177)
        q_mean = q_data.mean(axis=0)
        if args.architecture == "as_resnet":
            model = projected_low_rank_residual_network(
                P, Phi, ranks=[8, 8], output_shift=q_mean
            )
        else:
            model = projected_dense(P, Phi, output_shift=q_mean)
    elif args.architecture == "generic_dense":
        model = GenericDense(output_dim=dQ)
    elif args.architecture == "linear":
        model = GenericLinear(output_dim=dQ)
    else:
        model = LowRankLinear(output_dim=dQ, rank=args.fixed_input_rank)

    h1_kwargs = {}
    jsp_path = os.path.join(args.data_dir, "JstarPhi_data.npz")
    if args.h1_weight > 0 and os.path.exists(jsp_path):
        jsp = np.load(jsp_path)
        n = m_data.shape[0]
        h1_kwargs = dict(
            JstarPhi_data=jsp["JstarPhi_data"][:n],
            input_decoder=P,
            output_encoder=jsp["MPhi"],
            h1_weight=args.h1_weight,
        )
        print("training with derivative-informed H1 loss")

    params, logger = train(
        model,
        m_data,
        q_data,
        epochs=args.epochs,
        batch_size=min(args.batch_size, m_data.shape[0]),
        learning_rate=args.learning_rate,
        seed=args.seed,
        verbose=True,
        optimizer=args.optimizer,
        hessian_low_rank=args.hessian_low_rank,
        hess_batch_size=args.hess_batch_size,
        record_spectrum=bool(args.record_spectrum) and args.optimizer == "incg",
        **h1_kwargs,
    )
    print(
        f"final: train_acc {logger['train_acc'][-1]:.4f} "
        f"val_acc {logger['val_acc'][-1]:.4f}"
    )
    if args.logger_out:
        with open(args.logger_out, "wb") as f:
            pickle.dump(logger, f)
    return logger


if __name__ == "__main__":
    main()
