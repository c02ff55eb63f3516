"""nefes_tpu — a TPU-native (JAX/XLA/Pallas) neural feature-field pose
refinement framework with the capabilities of ActiveVisionLab/NeFeS (CVPR 2024).

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

  geometry/    SE(3)/SO(3) exp-log maps, quaternions, coordinate alignment,
               ray generation (replaces lietorch / pytorch3d CUDA extensions
               with closed-form jnp — reference: script/models/poses.py,
               script/utils/lie_group_helper.py)
  fields/      NeRFH-NFF feature field, embedders, exposure MLP, fusion CNN
               (reference: script/models/nerfh_nff.py)
  render/      stratified + inverse-CDF hierarchical sampling, NeRF-W volume
               compositor with stop-gradient feature compositing, chunk-free
               jit renderer (reference: script/models/rendering.py)
  kernels/     Pallas TPU kernels (fused field MLP; replaces tiny-cuda-nn)
  features/    DFNet (VGG16 hypercolumn) feature extractor + APR model zoo
               (reference: script/feature/, script/dm/pose_model.py,
               script/mstransformer/)
  refine/      direct feature-matching refinement: SE(3)-delta (mode 3) and
               APR-weight (mode 2) loops as compiled lax.scan programs,
               PSNR/SSIM verification fail-safe (reference: script/dm/)
  data/        7-Scenes (dSLAM + COLMAP pGT) and Cambridge Landmarks loaders,
               world-setup alignment, luminance histograms
               (reference: dataset_loaders/)
  train/       three-stage progressive NeFeS training (reference:
               script/run_nefes.py)
  evaluation/  SE(3) pose-error metrics, accuracy buckets, golden-file
               harness against the reference's paper_result/ (reference:
               script/eval.py)
  parallel/    jax.sharding Mesh construction + data/ray-parallel shardings
               (replaces torch DataParallel — the only multi-device path in
               the reference, nerfh_nff.py:647-650)
"""

__version__ = "0.1.0"
