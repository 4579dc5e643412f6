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
    load_confusion_data as load_helmholtz_data,
    modify_projectors,
)


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
        if args.architecture == "as_resnet":
            # helmholtz DIPResNet variant: sigmoid residual activation
            model = projected_low_rank_residual_network(
                P, Phi, ranks=[8, 8], residual_activation="sigmoid"
            )
        else:
            model = projected_dense(P, Phi)
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
