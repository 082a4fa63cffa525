"""ganleaks_tpu — a TPU-native (JAX/Flax/Pallas/pjit) GAN membership-inference framework.

A from-scratch reimplementation of the capabilities of the GAN-Leaks research
codebase (victim generative models + full-black-box membership-inference attack
+ ROC/FID evaluation), designed TPU-first:

* Victim generators (DCGAN, WGAN-GP, PGGAN, VAE-GAN, medGAN and the privGAN
  variants) are pure-functional Flax modules trained with jit-compiled steps
  and Optax optimizers (reference: ``gan_models/*``).
* The fbb attack (reference: ``attack_models/fbb.py``) is a device-resident
  pipeline ``sample -> featurize -> kNN -> ROC``: both the pixel-L2 and the
  LPIPS perceptual distance are expressed as squared Euclidean distances in an
  embedding space, so the whole query-set x generated-set distance matrix is
  one MXU matmul with a fused Pallas distance+argmin kernel, sharded over the
  generated-set axis across a TPU mesh.
* Evaluation (ROC/AUC/AP, FID) runs device-side (reference:
  ``attack_models/eval_roc.py``, ``z_fid.py``).

Artifact formats (PNG sample dirs, ``pos_loss.npy``/``neg_loss.npy``, npz
sample dumps) are kept byte-compatible with the reference so outputs
cross-validate.
"""

__version__ = "0.1.0"
