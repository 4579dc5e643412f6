"""Full confusion pipeline driver.

Port of `applications/confusion/confusion_problem_setup.py:39-215`
(reference): build the observable + prior, construct AS (input/output), KLE,
POD, run projection error tests, generate training and Jacobian data, and
persist everything (arrays + error curves + timing metadata) in the
reference's artifact layout.

Run:  python applications/confusion_setup.py --nx 64 --rank 128 --n_samples 512
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nx", type=int, default=64)
    parser.add_argument("--sqrt_n_obs", type=int, default=10)
    parser.add_argument("--rank", type=int, default=128, help="AS/KLE/POD rank")
    parser.add_argument("--oversampling", type=int, default=10)
    parser.add_argument("--n_samples", type=int, default=512)
    parser.add_argument("--n_data", type=int, default=512)
    parser.add_argument("--gamma", type=float, default=0.1)
    parser.add_argument("--delta", type=float, default=1.0)
    parser.add_argument("--output", type=str, default="confusion_output/")
    parser.add_argument("--dtype", type=str, default="float64")
    parser.add_argument("--error_test", action="store_true")
    parser.add_argument("--jacobian_rank", type=int, default=128)
    args = parser.parse_args()

    import jax

    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    from applications.confusion import confusion_linear_observable, confusion_prior
    import hippyflow_tpu as hf

    os.makedirs(args.output, exist_ok=True)
    metadata = {}

    observable, Vh = confusion_linear_observable(
        nx=args.nx, sqrt_n_obs=args.sqrt_n_obs
    )
    prior = confusion_prior(Vh, gamma=args.gamma, delta=args.delta)
    print(f"dofs: {Vh.dim}, observations: {observable.dQ}")

    # ---- Active subspaces (input + output) ---------------------------------
    AS_params = hf.ActiveSubspaceParameterList()
    AS_params["rank"] = args.rank
    AS_params["oversampling"] = args.oversampling
    AS_params["samples_per_process"] = args.n_samples
    AS_params["save_and_plot"] = True
    AS_params["output_directory"] = args.output
    AS = hf.ActiveSubspaceProjector(observable, prior, parameters=AS_params)

    d_GN, as_dec, as_enc = AS.construct_input_subspace()
    metadata["as_input_time"] = AS._input_subspace_construction_time
    d_NG, out_dec, out_enc = AS.construct_output_subspace()
    metadata["as_output_time"] = AS._output_subspace_construction_time

    # ---- KLE -----------------------------------------------------------------
    KLE_params = hf.KLEParameterList()
    KLE_params["rank"] = args.rank
    KLE_params["oversampling"] = args.oversampling
    KLE_params["save_and_plot"] = True
    KLE_params["output_directory"] = args.output
    KLE = hf.KLEProjector(prior, parameters=KLE_params)
    d_KLE, kle_dec, kle_enc = KLE.construct_input_subspace("mass")
    metadata["kle_time"] = KLE._subspace_construction_time

    # ---- POD -----------------------------------------------------------------
    POD_params = hf.PODParameterList()
    POD_params["rank"] = min(args.rank, observable.dQ)
    POD_params["sample_per_process"] = args.n_samples
    POD_params["data_per_process"] = args.n_data
    POD_params["save_and_plot"] = True
    POD_params["output_directory"] = args.output
    POD = hf.PODProjector(observable, prior, parameters=POD_params)
    d_POD, pod_dec, pod_enc = POD.construct_subspace()
    metadata["pod_time"] = POD._subspace_construction_time

    # ---- projection error tests -----------------------------------------------
    if args.error_test:
        ranks = [r for r in (8, 16, 32, 64, 128) if r <= args.rank] or [args.rank]
        t0 = time.time()
        # joint input/output test at the reference driver's rank pairs
        # (`confusion_problem_setup.py:157-189`: rank_pairs = zip of the
        # rank ladder with itself, capped by the observable dimension)
        rank_pairs = [
            (r, min(r, observable.dQ)) for r in ranks
        ]
        io_avg, io_std = POD.input_output_error_test(
            as_dec, Cinv_matmat=prior.R_matmat, rank_pairs=rank_pairs
        )
        error_data = {
            "as": AS.test_errors(ranks=ranks, test_input=True, test_output=True),
            "kle": KLE.test_errors(ranks=ranks),
            "pod": POD.test_output_errors(ranks=[r for r in ranks if r <= observable.dQ]),
            "input_output": {
                "rank_pairs": rank_pairs, "avg": io_avg, "std": io_std,
            },
        }
        metadata["error_test_time"] = time.time() - t0
        with open(os.path.join(args.output, "error_data.pkl"), "wb") as f:
            pickle.dump(error_data, f)

    # ---- training + Jacobian data ------------------------------------------------
    t0 = time.time()
    POD.generate_training_data(args.output, n_data=args.n_data)
    metadata["data_time"] = time.time() - t0
    t0 = time.time()
    AS.construct_low_rank_Jacobians(os.path.join(args.output, "jacobian_data/"))
    metadata["jacobian_data_time"] = time.time() - t0

    with open(os.path.join(args.output, "metadata.pkl"), "wb") as f:
        pickle.dump(metadata, f)
    print("metadata:", metadata)


if __name__ == "__main__":
    main()
