"""Generate PARITY_INDEX.md — a per-symbol map from every top-level symbol
in the reference's .py modules to its equivalent in this framework.

Two guarantees, both machine-checked (tests/test_parity_index.py):
  1. completeness — the entry table covers EXACTLY the set of top-level
     functions/classes ast-enumerated from /root/reference/*.py (keyed by
     (file, name, lineno), since models.py rebinds ResNet9_myrtle/ResNet9);
  2. resolvability — every repo target named here actually imports.

Statuses:
  ported   — a direct repo equivalent exists (named in `target`);
  inlined  — the behavior is absorbed into the named repo symbol, no
             standalone function (helper bodies, plain variables, …);
  dead     — the reference symbol is verified dead (no call site in any
             .py or notebook; see PARITY.md "not ported" list) and is
             deliberately not ported;
  n/a      — torch-framework plumbing with no JAX counterpart needed.

Usage: python scripts/parity_index.py [--check]  (--check: resolve +
completeness only, write nothing).
"""
from __future__ import annotations

import argparse
import ast
import importlib
import pathlib
import sys

REF = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parent.parent / "PARITY_INDEX.md"

# (ref_file, symbol, lineno, status, repo target ("module:qualname" or
#  "module"), note)
ENTRIES = [
    # ---- augmentations.py ----------------------------------------------
    ("augmentations.py", "cutmix_multidim_tensors", 30, "ported",
     "pcgmix_tpu.ops.piecewise:piecewise_mix",
     "concat-style cut (rebuilds frames_new) as the masked piecewise kernel; plans built in augment.engine"),
    ("augmentations.py", "optimal_displacement_max_envelope", 60, "ported",
     "pcgmix_tpu.augment.salopt:optimal_displacement_max_envelope", ""),
    ("augmentations.py", "optimal_displacement_max_sum", 95, "ported",
     "pcgmix_tpu.augment.salopt:optimal_displacement_max_sum", ""),
    ("augmentations.py", "normalize_saliency_state", 130, "dead", "",
     "never called from any .py/.ipynb (PARITY.md dead-code list)"),
    ("augmentations.py", "optimal_displacement_puzzle", 145, "dead", "",
     "unreachable from the method DSL (salopt dispatches env/sum only)"),
    ("augmentations.py", "smooth_mask_with_k2", 192, "dead", "",
     "never called"),
    ("augmentations.py", "plot_heartbeat_mixing", 199, "dead", "",
     "debug plot, never called"),
    ("augmentations.py", "mixup_keepdur_multidim_tensors_salopt", 210, "ported",
     "pcgmix_tpu.augment.salopt:salopt_displacements",
     "displacement search; the blend itself is the shared keepdur kernel"),
    ("augmentations.py", "mixup_keepdur_multidim_tensors", 289, "ported",
     "pcgmix_tpu.ops.piecewise:segment_blend_pieces",
     "vmapped masked blend + Pallas fast path (ops.pallas_mix); golden-tested vs the genuine reference"),
    ("augmentations.py", "cutmix_keepdur_multidim_tensors", 340, "ported",
     "pcgmix_tpu.ops.piecewise:piecewise_mix",
     "keepdur cut expressed as sel/alpha plan rows of the same kernel"),
    ("augmentations.py", "distances_to_rankings", 372, "inlined",
     "pcgmix_tpu.augment.pairing:closest_knn",
     "ranking transform inside closest_knn/closest_bins"),
    ("augmentations.py", "get_same_label_closestknn", 386, "ported",
     "pcgmix_tpu.augment.pairing:closest_knn", "greedy TSP + 2-opt on host"),
    ("augmentations.py", "get_same_label_closestbins", 440, "ported",
     "pcgmix_tpu.augment.pairing:closest_bins", ""),
    ("augmentations.py", "get_same_label_mix_indices", 500, "ported",
     "pcgmix_tpu.augment.pairing:same_label",
     "bit-exact Random(step) per-class shuffle (rng.grouped_shuffle)"),
    ("augmentations.py", "get_same_cvd_mix_indices", 516, "ported",
     "pcgmix_tpu.augment.pairing:same_cvd",
     "cvds_map.csv front-end: data.datasets:load_cvd_map"),
    ("augmentations.py", "get_same_wav_mix_indices", 528, "ported",
     "pcgmix_tpu.augment.pairing:same_wav", ""),
    ("augmentations.py", "get_same_dataset_mix_indices", 542, "ported",
     "pcgmix_tpu.augment.pairing:same_dataset", ""),
    ("augmentations.py", "get_same_length_mix_indices", 558, "ported",
     "pcgmix_tpu.augment.pairing:same_length", "(5bins)/(10bins) parsed by the DSL"),
    ("augmentations.py", "get_optimal_sal_mix_indices", 584, "ported",
     "pcgmix_tpu.augment.pairing:optimal_saliency",
     "dead in the reference (calls undefined opt_sal_overlap); intent reconstructed + tested"),
    ("augmentations.py", "get_same_umc_subset_mix_indices", 632, "ported",
     "pcgmix_tpu.augment.pairing:same_umc_subset", ""),
    ("augmentations.py", "get_lambda", 659, "ported",
     "pcgmix_tpu.rng:np_beta_lambda", "bit-exact np.random.seed(step) Beta draw"),
    ("augmentations.py", "sigmoid", 668, "inlined",
     "pcgmix_tpu.augment.engine:AugmentEngine",
     "(smooth) sigmoid crossfade inside the concat apply (jax.nn.sigmoid)"),
    ("augmentations.py", "magnitude_warp", 674, "ported",
     "pcgmix_tpu.ops.spline:magnitude_warp",
     "scipy-CubicSpline-parity precomputed basis matmul"),
    ("augmentations.py", "time_warp", 685, "ported",
     "pcgmix_tpu.ops.spline:time_warp", ""),
    ("augmentations.py", "augment", 698, "ported",
     "pcgmix_tpu.augment.engine:AugmentEngine",
     "host plan + on-device apply; method DSL via augment.methods:parse_method"),
    # ---- augmentations2d.py --------------------------------------------
    ("augmentations2d.py", "get_lambda", 19, "ported",
     "pcgmix_tpu.rng:np_beta_lambda", "shared with 1-D"),
    ("augmentations2d.py", "sigmoid", 28, "inlined",
     "pcgmix_tpu.augment.engine:AugmentEngine", "as in 1-D"),
    ("augmentations2d.py", "cutmix_multidim_tensors", 34, "ported",
     "pcgmix_tpu.ops.piecewise:piecewise_mix", "2-D: pieces along the time axis"),
    ("augmentations2d.py", "optimal_displacement_max_envelope", 53, "ported",
     "pcgmix_tpu.augment.salopt:optimal_displacement_max_envelope", "shared"),
    ("augmentations2d.py", "optimal_displacement_max_sum", 89, "ported",
     "pcgmix_tpu.augment.salopt:optimal_displacement_max_sum", "shared"),
    ("augmentations2d.py", "mixup_keepdur_multidim_tensors_salopt", 125, "ported",
     "pcgmix_tpu.augment.salopt:salopt_displacements", "shared"),
    ("augmentations2d.py", "mixup_keepdur_multidim_tensors", 206, "ported",
     "pcgmix_tpu.ops.piecewise:segment_blend_pieces", ""),
    ("augmentations2d.py", "cutmix_keepdur_multidim_tensors", 223, "ported",
     "pcgmix_tpu.ops.piecewise:piecewise_mix",
     "the reference's broken 2-D (rand) branch pinned as identity (PARITY.md)"),
    ("augmentations2d.py", "get_same_label_mix_indices", 251, "ported",
     "pcgmix_tpu.augment.pairing:same_label", "shared"),
    ("augmentations2d.py", "augment", 267, "ported",
     "pcgmix_tpu.augment.engine:AugmentEngine", "spectrogram=True"),
    # ---- classical.py ---------------------------------------------------
    ("classical.py", "extract_features_python", 62, "ported",
     "pcgmix_tpu.classical.features:extract_features",
     "incl. start_counter resume, periodic CSV checkpoints, problematic skip-list"),
    ("classical.py", "remove_segments_meanEnvelope", 115, "ported",
     "pcgmix_tpu.classical.experiment:remove_segments_mean_envelope", ""),
    ("classical.py", "aggregate_features_into_rec_mean_and_sd", 148, "ported",
     "pcgmix_tpu.classical.experiment:aggregate_features_rolling", ""),
    ("classical.py", "get_mean_and_SD_of_seg_features_window", 165, "inlined",
     "pcgmix_tpu.classical.experiment:aggregate_features_rolling",
     "cyclic-window helper inlined"),
    ("classical.py", "aggregate_features_into_rec_mean_and_sd_single_vector", 202,
     "ported", "pcgmix_tpu.classical.experiment:aggregate_features_single", ""),
    ("classical.py", "feature_vector_seg", 245, "ported",
     "pcgmix_tpu.classical.features:feature_vector_seg",
     "255/255 feature-name parity machine-checked (tests/test_classical_feature_names.py); DSP stack reimplemented in classical.dsp (librosa/pywt/antropy absent here)"),
    ("classical.py", "mean_confidence_interval", 1295, "ported",
     "pcgmix_tpu.classical.experiment:mean_confidence_interval", ""),
    ("classical.py", "mean_SD_95CI", 1303, "ported",
     "pcgmix_tpu.classical.experiment:mean_sd_95ci", ""),
    ("classical.py", "generate_nCV_folds", 1312, "ported",
     "pcgmix_tpu.classical.experiment:generate_ncv_folds", ""),
    ("classical.py", "search_space_grid", 1320, "ported",
     "pcgmix_tpu.classical.experiment:search_space_grid",
     "8 sklearn classifiers + optional XGB (in-image), MI top-40"),
    ("classical.py", "run_experiment", 1391, "ported",
     "pcgmix_tpu.classical.experiment:run_experiment",
     "CLI: python -m pcgmix_tpu.classical"),
    # ---- dataloaders ----------------------------------------------------
    ("dataloader_physionet.py", "physionet_dataset", 9, "ported",
     "pcgmix_tpu.data.physionet:physionet_split",
     "sig_qual filter, 12-way balance (seed 18), n_fraction, 5-fold CV; packs into data.datasets:ArrayDataset"),
    ("dataloader_physionet.py", "physionet_dataloader", 182, "ported",
     "pcgmix_tpu.data.loader:EpochIterator",
     "torch-parity epoch order; eval batches via data.loader:eval_batches"),
    ("dataloader_physionet2d.py", "physionet_dataset", 9, "ported",
     "pcgmix_tpu.data.physionet:physionet_split", "spectrogram=True adds the channel dim"),
    ("dataloader_physionet2d.py", "physionet_dataloader", 125, "ported",
     "pcgmix_tpu.data.loader:EpochIterator", ""),
    ("dataloader_umc.py", "umc_dataset", 9, "ported",
     "pcgmix_tpu.data.umc:umc_split",
     "label swap, excluded filter, hardcoded 10 patient folds (derived groups verified equal), 3-fold inner valid"),
    ("dataloader_umc.py", "umc_dataloader", 175, "ported",
     "pcgmix_tpu.data.loader:EpochIterator", ""),
    ("dataloader_umc2d.py", "umc_dataset", 9, "ported",
     "pcgmix_tpu.data.umc:umc_split", "spectrogram=True"),
    ("dataloader_umc2d.py", "umc_dataloader", 149, "ported",
     "pcgmix_tpu.data.loader:EpochIterator", ""),
    # ---- latent_space.py -------------------------------------------------
    ("latent_space.py", "generate_latent_space", 43, "ported",
     "pcgmix_tpu.latent:LatentSpace", "frozen-checkpoint embedding fn, loaded once"),
    ("latent_space.py", "save_latent_space", 49, "ported",
     "pcgmix_tpu.latent:save_latent_space", ""),
    ("latent_space.py", "get_latent_space_features", 56, "ported",
     "pcgmix_tpu.latent:latent_space_for", ""),
    ("latent_space.py", "get_hidden_features", 66, "ported",
     "pcgmix_tpu.latent:get_hidden_features", ""),
    ("latent_space.py", "dim_reduc_tsne", 92, "ported",
     "pcgmix_tpu.latent:dim_reduc_tsne", "host-side sklearn"),
    ("latent_space.py", "dim_reduc_pca", 108, "ported",
     "pcgmix_tpu.latent:dim_reduc_pca", ""),
    ("latent_space.py", "normalize_points", 120, "inlined",
     "pcgmix_tpu.latent:plot_latent_space", ""),
    ("latent_space.py", "normalize_data", 131, "inlined",
     "pcgmix_tpu.latent:plot_latent_space", ""),
    ("latent_space.py", "plot_latent_space", 134, "ported",
     "pcgmix_tpu.latent:plot_latent_space", ""),
    ("latent_space.py", "plot_latent_space_test", 197, "ported",
     "pcgmix_tpu.latent:plot_latent_space_test", ""),
    ("latent_space.py", "plot_latent_space_test_train", 242, "ported",
     "pcgmix_tpu.latent:plot_latent_space_test_train", ""),
    # ---- models.py -------------------------------------------------------
    ("models.py", "inceptiontime_singstad_d3_TS", 9, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'Singstad_d3'"),
    ("models.py", "inceptiontime_singstad_d6_TS", 12, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'Singstad_d6'"),
    ("models.py", "inceptiontime_singstad_d10_TS", 15, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'Singstad_d10'"),
    ("models.py", "inception_module", 18, "ported",
     "pcgmix_tpu.models.singstad:InceptionModule", ""),
    ("models.py", "Lambda", 61, "n/a", "",
     "torch nn.Module wrapper around a function; flax modules call functions directly"),
    ("models.py", "inceptime_singstad_d10", 68, "ported",
     "pcgmix_tpu.models.singstad:SingstadInceptionTime", "depth=10"),
    ("models.py", "inceptime_singstad_d6", 187, "ported",
     "pcgmix_tpu.models.singstad:SingstadInceptionTime", "depth=6"),
    ("models.py", "inceptime_singstad_d3", 306, "ported",
     "pcgmix_tpu.models.singstad:SingstadInceptionTime", "depth=3"),
    ("models.py", "CNN_potes_big128and64_TS", 339, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'PotesBig128and64' (POTES_PRESETS)"),
    ("models.py", "CNN_potes_big64and32_TS", 342, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'PotesBig64and32'"),
    ("models.py", "CNN_potes_TS", 345, "ported",
     "pcgmix_tpu.models.potes:PotesCNN", "name 'Potes'"),
    ("models.py", "CNN_potes_tenpercent_TS", 352, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'Potes0.1'"),
    ("models.py", "CNN_potes_twopercent_TS", 355, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'Potes0.02'"),
    ("models.py", "conv_block_1d", 359, "inlined",
     "pcgmix_tpu.models.potes:PotesCNN", "conv+BN+ReLU(+pool) block"),
    ("models.py", "CNN_potes", 367, "ported",
     "pcgmix_tpu.models.potes:PotesCNN",
     "dead cnn2-4 branches not materialized — forward identical, param count lower (PARITY.md)"),
    ("models.py", "conv_block", 468, "ported",
     "pcgmix_tpu.models.layers:ConvBNAct", ""),
    ("models.py", "ResNet9_myrtle", 475, "dead", "",
     "shadowed: rebound by the second definition at :520 before any call resolves"),
    ("models.py", "ResNet9", 516, "dead", "",
     "shadowed by the definition at :588"),
    ("models.py", "ResNet9_myrtle", 520, "ported",
     "pcgmix_tpu.models.resnet9:ResNet9_1D",
     "split forward (depth, part='first'/'second'/'latent_space') supported"),
    ("models.py", "ResNet9", 588, "ported",
     "pcgmix_tpu.models.registry:build_model",
     "width presets resnet9-5k..resnet9-9m == train_model.py:341-358"),
    ("models.py", "FCN_TS_custom", 592, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'FCN(custom)'"),
    ("models.py", "FCN_custom", 595, "ported",
     "pcgmix_tpu.models.fcn:FCN", "custom widths [64,128,64]"),
    ("models.py", "FCN_TS", 657, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'FCN'"),
    ("models.py", "FCN", 660, "ported",
     "pcgmix_tpu.models.fcn:FCN", ""),
    ("models.py", "ResCNN_TS", 721, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'ResCNN'"),
    ("models.py", "_ResCNNBlock", 724, "inlined",
     "pcgmix_tpu.models.rescnn:ResCNN", ""),
    ("models.py", "ResCNN", 745, "ported",
     "pcgmix_tpu.models.rescnn:ResCNN", "incl. PReLU"),
    ("models.py", "ResNet_TS", 813, "ported",
     "pcgmix_tpu.models.registry:build_model", "name 'ResNet'"),
    ("models.py", "ResBlock", 816, "inlined",
     "pcgmix_tpu.models.resnet_ts:ResNetTS", ""),
    ("models.py", "ResNet", 837, "ported",
     "pcgmix_tpu.models.resnet_ts:ResNetTS", ""),
    # ---- models2d.py -----------------------------------------------------
    ("models2d.py", "conv_block", 6, "ported",
     "pcgmix_tpu.models.layers:ConvBNAct", "2-D variant"),
    ("models2d.py", "ResNet9_myrtle", 13, "ported",
     "pcgmix_tpu.models.resnet9_2d:ResNet9_2D",
     "linear 8192 (128²) / 2048 (64²) shape-inferred"),
    ("models2d.py", "ResNet9", 86, "ported",
     "pcgmix_tpu.models.registry:build_model",
     "spectrogram datasets select the 2-D variant (train_model.py:294-302)"),
    # ---- plotters.py -----------------------------------------------------
    ("plotters.py", "normalize_data", 9, "dead", "",
     "no call site in any .py/.ipynb"),
    ("plotters.py", "conf_int", 12, "dead", "",
     "no call site in any .py/.ipynb"),
    ("plotters.py", "plot_epoch_loss", 19, "ported",
     "pcgmix_tpu.exp.plotters:plot_epoch_loss", ""),
    ("plotters.py", "gauss_function", 42, "inlined",
     "pcgmix_tpu.exp.plotters:plot_epoch_loss_gmm", ""),
    ("plotters.py", "plot_epoch_loss_dst", 45, "ported",
     "pcgmix_tpu.exp.plotters:plot_epoch_loss_gmm", "GMM fit over the loss histogram"),
    ("plotters.py", "plot_train_test_acc", 88, "ported",
     "pcgmix_tpu.exp.plotters:plot_train_test_acc", ""),
    ("plotters.py", "plot_train_test_loss", 109, "ported",
     "pcgmix_tpu.exp.plotters:plot_train_test_loss", ""),
    ("plotters.py", "plot_variability", 128, "ported",
     "pcgmix_tpu.exp.plotters:plot_variability", ""),
    ("plotters.py", "plot_times", 150, "ported",
     "pcgmix_tpu.exp.plotters:plot_times", ""),
    ("plotters.py", "plot_lr_per_step", 171, "ported",
     "pcgmix_tpu.exp.plotters:plot_lr_per_step", ""),
    ("plotters.py", "plot_m1", 189, "ported",
     "pcgmix_tpu.exp.plotters:plot_m1", "GMM-mean trajectory over epochs"),
    # ---- read_experiments.py ---------------------------------------------
    ("read_experiments.py", "read_experiments_all_dataseeds", 10, "ported",
     "pcgmix_tpu.exp.results:read_experiments_all_dataseeds",
     "per-nfrac seed_data grids + test-seed rules; CLI pcgmix-results"),
    ("read_experiments.py", "read_experiments", 109, "dead", "",
     "vestigial code from another project: calls nonexistent utils.results_dir, wrong-arity hyperparameters_robust (PARITY.md)"),
    ("read_experiments.py", "hyperparameters_robust", 151, "ported",
     "pcgmix_tpu.exp.robust:hyperparameters_robust",
     "+cp apply-probability schedules verified equal"),
    # ---- saliency.py ------------------------------------------------------
    ("saliency.py", "gaussian_kernel", 15, "ported",
     "pcgmix_tpu.saliency:gaussian_kernel", ""),
    ("saliency.py", "get_saliency_maps", 20, "ported",
     "pcgmix_tpu.saliency:saliency_maps",
     "checkpoint loaded ONCE per run via make_pretrained_saliency_fn (the reference reloads per batch)"),
    ("saliency.py", "bin_tensor", 118, "inlined",
     "pcgmix_tpu.saliency:training_saliency_bins", "interpolate+repeat binning"),
    ("saliency.py", "saliency_map", 132, "ported",
     "pcgmix_tpu.saliency:training_saliency_bins",
     "in-training variant (current model copy, n=57/σ=7.54 quirk preserved)"),
    # ---- train_model.py ---------------------------------------------------
    ("train_model.py", "CELoss", 45, "ported",
     "pcgmix_tpu.train.losses:soft_target_ce", ""),
    ("train_model.py", "SELCLoss", 56, "ported",
     "pcgmix_tpu.train.losses:selc_update",
     "+ init_selc_table; device-resident soft-label table, sharded under DP"),
    ("train_model.py", "custom_loss", 82, "ported",
     "pcgmix_tpu.train.steps:make_forward_loss",
     "per-sample losses for lc-nointrusion candidate scoring"),
    ("train_model.py", "step_counter_class", 105, "inlined",
     "pcgmix_tpu.train.loop:train_model", "plain step_count"),
    ("train_model.py", "variability_counter_class", 111, "ported",
     "pcgmix_tpu.train.counters:VariabilityCounter",
     "opt-in (the reference's update call is commented out)"),
    ("train_model.py", "count_model_parameters", 162, "ported",
     "pcgmix_tpu.models.registry:count_parameters",
     "printed at train start like train_model.py:387"),
    ("train_model.py", "calculate_gradients_norm", 165, "dead", "",
     "never called (PARITY.md)"),
    ("train_model.py", "set_seed", 173, "inlined",
     "pcgmix_tpu.rng",
     "JAX PRNG fold_in protocol + bit-exact host RNG helpers (seed_fix=4 default in TrainConfig)"),
    ("train_model.py", "performance_metrics_class", 178, "ported",
     "pcgmix_tpu.train.metrics:PerformanceTracker", "same performance.pkl schema"),
    ("train_model.py", "train_model", 197, "ported",
     "pcgmix_tpu.train.loop:train_model", "the main entry point"),
    ("train_model.py", "train_epoch", 490, "ported",
     "pcgmix_tpu.train.steps:make_train_step",
     "jitted fused step (augment+fwd+bwd+clip+sched); epoch loop + scan dispatch in train.loop; multi-step scan via make_multi_step"),
    ("train_model.py", "test_data_accuracy", 591, "ported",
     "pcgmix_tpu.train.metrics:recording_level_eval",
     "mean-prob vote / (class_majority) tie→abnormal; driven by train.loop:evaluate"),
    ("train_model.py", "calc_acc", 672, "ported",
     "pcgmix_tpu.train.metrics:segment_accuracy", ""),
    ("train_model.py", "plot_wav_predprobas_boxplot", 690, "ported",
     "pcgmix_tpu.exp.plotters:plot_wav_predprobas", ""),
    # ---- utils.py ----------------------------------------------------------
    ("utils.py", "check_folder", 7, "ported", "pcgmix_tpu.utils:check_folder", ""),
    ("utils.py", "save_dict", 12, "ported", "pcgmix_tpu.utils:save_dict", ""),
    ("utils.py", "load_dict", 16, "ported", "pcgmix_tpu.utils:load_dict", ""),
    ("utils.py", "timer", 21, "ported", "pcgmix_tpu.utils:timer", ""),
    ("utils.py", "experiment_already_done", 26, "ported",
     "pcgmix_tpu.exp.dirs:experiment_already_done", "grid resume contract"),
    ("utils.py", "experiment_dir", 34, "ported",
     "pcgmix_tpu.exp.dirs:experiment_dir", "byte-identical run-dir naming"),
    ("utils.py", "read_pkl_acc", 55, "dead", "",
     "reachable only from the dead read_experiments.read_experiments"),
    ("utils.py", "read_pkl_perf", 62, "ported",
     "pcgmix_tpu.exp.results:read_performance", ""),
    ("utils.py", "read_pkl_var", 67, "dead", "", "no call site"),
    ("utils.py", "read_pkl_hid_rep", 76, "dead", "", "no call site"),
    ("utils.py", "show_spectrogram", 86, "ported",
     "pcgmix_tpu.exp.viz:show_spectrogram", ""),
    ("utils.py", "show_sal", 99, "ported", "pcgmix_tpu.exp.viz:show_sal", ""),
    ("utils.py", "show_sig", 108, "ported", "pcgmix_tpu.exp.viz:show_sig", ""),
    ("utils.py", "dict2file", 172, "ported",
     "pcgmix_tpu.utils:dict2file", "zlib+pickle byte-compatible"),
    ("utils.py", "file2dict", 181, "ported", "pcgmix_tpu.utils:file2dict", ""),
]


def enumerate_reference():
    """(file, name, lineno) for every top-level def/class in /root/reference/*.py."""
    found = set()
    for p in sorted(REF.glob("*.py")):
        tree = ast.parse(p.read_text(), filename=str(p))
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                found.add((p.name, node.name, node.lineno))
    return found


def resolve(target: str):
    """Import 'module:qualname' (or bare 'module'); raise if missing."""
    if ":" not in target:
        importlib.import_module(target)
        return
    mod_name, qual = target.split(":", 1)
    obj = importlib.import_module(mod_name)
    for part in qual.split("."):
        obj = getattr(obj, part)


def check() -> list[str]:
    errors = []
    entry_keys = {(f, n, ln) for f, n, ln, *_ in ENTRIES}
    if len(entry_keys) != len(ENTRIES):
        errors.append("duplicate entries in ENTRIES")
    if REF.exists():
        ref_keys = enumerate_reference()
        for k in sorted(ref_keys - entry_keys):
            errors.append(f"reference symbol missing from index: {k}")
        for k in sorted(entry_keys - ref_keys):
            errors.append(f"index entry not found in reference: {k}")
    for f, n, ln, status, target, _ in ENTRIES:
        if status in ("ported", "inlined"):
            if not target:
                errors.append(f"{f}:{n}: status {status} but no target")
                continue
            try:
                resolve(target)
            except Exception as e:  # noqa: BLE001 - report any resolution failure
                errors.append(f"{f}:{n}: target {target!r} does not resolve: {e}")
        elif target:
            errors.append(f"{f}:{n}: status {status} should have no target")
    return errors


def generate() -> str:
    counts = {}
    for _f, _n, _ln, status, _t, _note in ENTRIES:
        counts[status] = counts.get(status, 0) + 1
    lines = [
        "# Parity index (generated — do not edit; run scripts/parity_index.py)",
        "",
        "Per-symbol map of every top-level function/class in the reference's",
        ".py modules to its equivalent here.  Machine-checked by",
        "tests/test_parity_index.py: the table is complete against an AST",
        "enumeration of /root/reference/*.py and every named target imports.",
        "Behavior-level parity (bit-exact vs distributional) is in PARITY.md;",
        "notebook-cell coverage is in ROADMAP.md.",
        "",
        "Statuses: **ported** (direct equivalent), **inlined** (absorbed into",
        "the named symbol), **dead** (verified dead in the reference — no call",
        "site in any .py or notebook — and deliberately not ported), **n/a**",
        "(torch plumbing without a JAX counterpart).",
        "",
        f"Totals: {len(ENTRIES)} symbols — "
        + ", ".join(f"{counts[s]} {s}" for s in ("ported", "inlined", "dead", "n/a") if s in counts)
        + ".",
    ]
    current = None
    for f, n, ln, status, target, note in ENTRIES:
        if f != current:
            lines += ["", f"## {f}", "",
                      "| reference symbol | status | here | note |",
                      "|---|---|---|---|"]
            current = f
        tgt = f"`{target}`" if target else "—"
        lines.append(f"| `{n}` (:{ln}) | {status} | {tgt} | {note} |")
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", action="store_true", help="validate only")
    args = ap.parse_args()
    errors = check()
    if errors:
        for e in errors:
            print(f"ERROR: {e}", file=sys.stderr)
        sys.exit(1)
    if not args.check:
        OUT.write_text(generate())
        print(f"wrote {OUT} ({len(ENTRIES)} symbols)")
    else:
        print(f"ok ({len(ENTRIES)} symbols)")


if __name__ == "__main__":
    main()
