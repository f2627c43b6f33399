"""CLI entry points mirroring the reference's 19 scripts (SURVEY.md §2.6).

Run any as `python -m inverseproblemwithdiffusionmodel_tpu.scripts.<name>`:
training (train_ncsn, train_clf, train_seg), prior sampling
(unconditioned_sampling), MNIST (mnist_MAP, mnist_inv_clf_sampling,
mnist_inv_clf_prox_sampling), ACDC (acdc_MAP, acdc_MAP_keep_center,
acdc_inv_seg_sampling_keep_center_prox_real_imag, acdc_SENSE_real_img,
acdc_SENSE_MAP, acdc_SENSE_TV), CINE
(cine_inv_sampling_keep_center_prox_real_imag, cine_SENSE_real_img_2d_time,
cine_SENSE_real_img_2d_time_MAP), job generation (generate_train_ncsn,
generate_train_seg), data prep (vol2slices).
"""
