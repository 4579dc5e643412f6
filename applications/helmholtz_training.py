"""DIPNet surrogate training driver for the helmholtz problem.

Port of `applications/helmholtz_2d/dipnet_paper/helmholtz_training.py`
(reference).  Same pipeline as confusion_training with the helmholtz
variants: sigmoid residual activation in the DIPResNet (reference
`helmholtz .../neuralNetworks.py` line-60 diff) and the helmholtz artifact
directory.

Run after `applications/helmholtz_setup.py`:
    python applications/helmholtz_training.py --data_dir helmholtz_output/
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from applications.confusion_training import (
    get_projectors,
    modify_projectors,
)


def load_helmholtz_data(
    data_dir: str,
    rescale: bool = False,
    derivatives: bool = False,
    n_data: int | None = None,
):
    """Load consolidated helmholtz (m, q) data with the reference loader's
    options (`helmholtz_utilities.py:17-114`): ``n_data`` truncation,
    ``rescale`` standard-scaling of m and q (zero mean / unit variance per
    feature, the reference's sklearn `preprocessing.scale`), and
    ``derivatives`` loading of the Jacobian-SVD bundle.

    Returns (m_data, q_data) or, with ``derivatives=True``, a dict with
    m_data/q_data plus U_data/sigma_data/V_data when Jsvd_data.npz exists.
    ``rescale`` with ``derivatives`` raises, as in the reference (scaled
    data invalidates the stored Jacobians)."""
    with np.load(os.path.join(data_dir, "mq_data.npz")) as data:
        m_data, q_data = data["m_data"], data["q_data"]
    if n_data is not None:
        m_data, q_data = m_data[:n_data], q_data[:n_data]
    if rescale:
        if derivatives:
            raise NotImplementedError(
                "rescale with derivative data is not defined: scaling (m, q) "
                "invalidates the stored Jacobian factors "
                "(reference helmholtz_utilities.py:109)"
            )

        def scale(x):
            sd = x.std(axis=0)
            return (x - x.mean(axis=0)) / np.where(sd > 0, sd, 1.0)

        m_data, q_data = scale(m_data), scale(q_data)
    if not derivatives:
        return m_data, q_data
    out = {"m_data": m_data, "q_data": q_data}
    jsvd_path = os.path.join(data_dir, "Jsvd_data.npz")
    if os.path.exists(jsvd_path):
        with np.load(jsvd_path) as jsvd:
            for k in ("U_data", "sigma_data", "V_data"):
                out[k] = jsvd[k] if n_data is None else jsvd[k][:n_data]
    else:
        print("No derivative data".center(80))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="helmholtz_output/")
    parser.add_argument("--architecture", type=str, default="as_resnet",
                        choices=["as_dense", "kle_dense", "as_resnet",
                                 "generic_dense", "linear", "low_rank_linear"])
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

    from hippyflow_tpu.nn import (
        GenericDense,
        GenericLinear,
        LowRankLinear,
        projected_dense,
        projected_low_rank_residual_network,
        train,
    )

    m_data, q_data = load_helmholtz_data(args.data_dir)
    if args.n_data:
        m_data, q_data = m_data[: args.n_data], q_data[: args.n_data]
    print(f"data: m {m_data.shape}, q {q_data.shape}")

    projectors = get_projectors(
        args.data_dir,
        fixed_input_rank=args.fixed_input_rank,
        fixed_output_rank=args.fixed_output_rank,
    )

    dM, dQ = m_data.shape[1], q_data.shape[1]
    P = None
    if args.architecture in ("as_dense", "kle_dense", "as_resnet"):
        basis = "AS_input" if args.architecture.startswith("as") else "KLE"
        P, Phi = modify_projectors(projectors, basis)
        # center the regression on the training-data mean (hessianlearn's
        # RegressionProblem(y_mean=q_mean), helmholtz_training.py:219)
        q_mean = q_data.mean(axis=0)
        if args.architecture == "as_resnet":
            # helmholtz DIPResNet variant: sigmoid residual activation
            model = projected_low_rank_residual_network(
                P, Phi, ranks=[8, 8], residual_activation="sigmoid",
                output_shift=q_mean,
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
    if args.h1_weight > 0 and os.path.exists(jsp_path) and P is not None:
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
