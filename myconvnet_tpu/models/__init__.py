"""Model zoo: the five BASELINE config families (SURVEY.md §2#2-4).

list_models()/get_model() are the public registry surface;
CLASSIFIERS/SEGMENTERS/GAN_* are the raw tables.

Every model is a pure forward function ``fn(x, num_classes, train=...)``
meant to be wrapped with ``core.transform``; the ConvNet-compatible class
API lives in ``models.base``.
"""

from myconvnet_tpu.models.alexnet import alexnet
from myconvnet_tpu.models.convnext import (convnext, convnext_small,
                                           convnext_tiny)
from myconvnet_tpu.models.repvgg import (repvgg, repvgg_a0, repvgg_a1,
                                         tinyrepvgg)
from myconvnet_tpu.models.regnet import (regnet, regnet_x_400mf,
                                         regnet_x_1_6gf,
                                         regnet_y_400mf,
                                         regnet_y_1_6gf)
from myconvnet_tpu.models.deeplab import aspp, deeplab_v3_plus
from myconvnet_tpu.models.densenet import (densenet, densenet121,
                                           densenet169, densenet201)
from myconvnet_tpu.models.efficientnet import (efficientnet,
                                               efficientnet_b0,
                                               efficientnet_b1,
                                               efficientnet_b2,
                                               efficientnet_b3,
                                               efficientnet_b4,
                                               efficientnet_b5,
                                               efficientnet_b6,
                                               efficientnet_b7)
from myconvnet_tpu.models.efficientnetv2 import (efficientnet_v2,
                                                 efficientnet_v2_l,
                                                 efficientnet_v2_m,
                                                 efficientnet_v2_s)
from myconvnet_tpu.models.inception import inception_v3
from myconvnet_tpu.models.mobilenet import mobilenet_v2
from myconvnet_tpu.models.mobilenetv3 import (mobilenet_v3_large,
                                              mobilenet_v3_small)
from myconvnet_tpu.models.pspnet import pspnet, pyramid_pooling
from myconvnet_tpu.models.gan import (dcgan_discriminator, dcgan_generator,
                                      patchgan_discriminator,
                                      resnet_generator, unet_generator)
from myconvnet_tpu.models.resnet import (resnet, resnet18, resnet34,
                                         resnet50, resnet101, resnet152,
                                         resnet_backbone, resnext50_32x4d,
                                         resnext101_32x8d, se_resnet50,
                                         se_resnet101, se_resnext50_32x4d)
from myconvnet_tpu.models.fcn import fcn
from myconvnet_tpu.models.ssd import ssd300, ssd512, tinydet
from myconvnet_tpu.models.faster_rcnn import faster_rcnn, tinyfrcnn
from myconvnet_tpu.models.fcos import fcos, tinyfcos
from myconvnet_tpu.models.keypoint_rcnn import keypoint_rcnn, tinykp
from myconvnet_tpu.models.mask_rcnn import mask_rcnn, tinymask
from myconvnet_tpu.models.panoptic import panoptic_fpn, tinypan
from myconvnet_tpu.models.retinanet import retinanet, tinyretina
from myconvnet_tpu.models.shufflenet import shufflenet_v2
from myconvnet_tpu.models.smallnet import smallnet
from myconvnet_tpu.models.squeezenet import squeezenet
from myconvnet_tpu.models.unet import unet
from myconvnet_tpu.models.wideresnet import (wide_resnet, wrn_16_8,
                                             wrn_28_10)
from myconvnet_tpu.models.vgg import vgg, vgg11, vgg16, vgg19
from myconvnet_tpu.models.vit import (tinyvit, vit, vit_b16, vit_b32,
                                      vit_l16, vit_s16, vit_ti16)
from myconvnet_tpu.models.xception import xception65, xception_backbone
from myconvnet_tpu.models.mae import (mae, mae_b16, mae_l16, patchify,
                                      tinymae, unpatchify)
from myconvnet_tpu.models.swin import (swin, swin_b, swin_s, swin_t,
                                       tinyswin)
from myconvnet_tpu.models.sr import (edsr, sr_discriminator, srresnet,
                                     tinysr)
from myconvnet_tpu.models.diffusion import (ddpm_unet, timestep_embedding,
                                            tiny_ddpm_unet)
from myconvnet_tpu.models.video import r2plus1d_18, r3d_18, tinyvideo
from myconvnet_tpu.models.embedding import embedding_net, tinyembed
from myconvnet_tpu.models.audio import m5, m11, melspec_cnn, tinyaudio
from myconvnet_tpu.models.style import (tiny_transformer_net,
                                        transformer_net)
from myconvnet_tpu.models.depth import depth_unet, tinydepth
from myconvnet_tpu.models.flow import (flownet_c, flownet_s, pwcnet,
                                       tinyflow, tinypwc)
from myconvnet_tpu.models.ocr import crnn, crnn_conv, tinyocr
from myconvnet_tpu.models.tracking import siamfc, tinysiamfc

# Registry keyed by the config-file model names (reference: model choice in
# parameters.py — SURVEY.md §2#10).
CLASSIFIERS = {
    "smallnet": smallnet,
    "alexnet": alexnet,
    "resnet18": resnet18, "resnet34": resnet34, "resnet50": resnet50,
    "resnet101": resnet101, "resnet152": resnet152,
    "se_resnet50": se_resnet50, "se_resnet101": se_resnet101,
    "resnext50_32x4d": resnext50_32x4d,
    "resnext101_32x8d": resnext101_32x8d,
    "se_resnext50_32x4d": se_resnext50_32x4d,
    "vgg11": vgg11, "vgg16": vgg16, "vgg19": vgg19,
    "densenet121": densenet121, "densenet169": densenet169,
    "densenet201": densenet201,
    "inception_v3": inception_v3,
    "mobilenet_v2": mobilenet_v2,
    "mobilenet_v3_large": mobilenet_v3_large,
    "mobilenet_v3_small": mobilenet_v3_small,
    "efficientnet_b0": efficientnet_b0, "efficientnet_b1": efficientnet_b1,
    "efficientnet_b2": efficientnet_b2, "efficientnet_b3": efficientnet_b3,
    "efficientnet_b4": efficientnet_b4, "efficientnet_b5": efficientnet_b5,
    "efficientnet_b6": efficientnet_b6, "efficientnet_b7": efficientnet_b7,
    "efficientnet_v2_s": efficientnet_v2_s,
    "efficientnet_v2_m": efficientnet_v2_m,
    "efficientnet_v2_l": efficientnet_v2_l,
    "wrn_28_10": wrn_28_10, "wrn_16_8": wrn_16_8,
    "wide_resnet": wide_resnet,  # generic depth/width via model_kwargs
    "shufflenet_v2": shufflenet_v2,
    "squeezenet": squeezenet,
    "xception65": xception65,
    "convnext_tiny": convnext_tiny,
    "repvgg_a0": repvgg_a0, "repvgg_a1": repvgg_a1,
    "tinyrepvgg": tinyrepvgg,
    "convnext_small": convnext_small,
    "regnet_x_400mf": regnet_x_400mf, "regnet_y_400mf": regnet_y_400mf,
    "regnet_x_1_6gf": regnet_x_1_6gf, "regnet_y_1_6gf": regnet_y_1_6gf,
    "vit_ti16": vit_ti16, "vit_s16": vit_s16, "vit_b16": vit_b16,
    "vit_b32": vit_b32, "vit_l16": vit_l16, "tinyvit": tinyvit,
    "swin_t": swin_t, "swin_s": swin_s, "swin_b": swin_b,
    "tinyswin": tinyswin,
}

SEGMENTERS = {
    "deeplab_v3_plus": deeplab_v3_plus,
    "unet": unet,
    "fcn": fcn,
    "pspnet": pspnet,
}

DETECTORS = {
    "ssd300": ssd300,
    "ssd512": ssd512,
    "tinydet": tinydet,
    "retinanet": retinanet,
    "faster_rcnn": faster_rcnn,
    "tinyfrcnn": tinyfrcnn,
    "mask_rcnn": mask_rcnn,
    "tinymask": tinymask,
    "keypoint_rcnn": keypoint_rcnn,
    "tinykp": tinykp,
    "panoptic_fpn": panoptic_fpn,
    "tinypan": tinypan,
    "fcos": fcos,
    "tinyfcos": tinyfcos,
    "tinyretina": tinyretina,
}

# Super-resolution (sixth task family): fn(x_lr, num_classes_ignored,
# train=, scale=, ...) -> HR image.  srresnet/sr_discriminator pair for
# the SRGAN path rides GAN_GENERATORS-style wiring in recipes.build_gan.
SR_MODELS = {
    "edsr": edsr,
    "tinysr": tinysr,
    "srresnet": srresnet,
}

# Diffusion epsilon-predictors (train/diffusion.py; seventh task
# family): fn(x, t, *, train, ...) -> predicted noise, same shape as x.
DIFFUSION_MODELS = {
    "ddpm_unet": ddpm_unet,
    "tinyddpm": tiny_ddpm_unet,
}

# Video classifiers (ninth task family): fn(x [N,T,H,W,3], num_classes,
# train=) -> logits, NDHWC clips through ops/conv3d.py.
VIDEO_MODELS = {
    "r3d_18": r3d_18,
    "r2plus1d_18": r2plus1d_18,
    "tinyvideo": tinyvideo,
}

# Metric-learning embedders (tenth task family): any classifier
# backbone re-headed to an L2-normalized embedding; margin heads
# (arcface/cosface) return cosines at train time, embeddings at eval
# (models/embedding.py).
EMBEDDING_MODELS = {
    "embedding_net": embedding_net,
    "tinyembed": tinyembed,
}

# Audio classifiers (eleventh task family): fn(x [N,T,1] waveform,
# num_classes, train=) -> logits; 1-D convs / on-device log-mel
# frontend through ops/audio.py.
AUDIO_MODELS = {
    "m5": m5,
    "m11": m11,
    "melspec_cnn": melspec_cnn,
    "tinyaudio": tinyaudio,
}

# Style-transfer generators (twelfth task family): fn(x [N,H,W,3] in
# [0,1]) -> stylized [0,1]; trained via train/style.py's fused
# perceptual-loss step (train/perceptual.py).
STYLE_MODELS = {
    "transformer_net": transformer_net,
    "tiny_transformer_net": tiny_transformer_net,
}

# Text recognizers (thirteenth task family): fn(x [N,32,W,1] in
# [0,1], num_classes=charset size, train=) -> [N, T, num_classes+1]
# CTC frame logits (blank = 0; ops/ctc.py, models/ocr.py).
OCR_MODELS = {
    "crnn": crnn,
    "crnn_conv": crnn_conv,
    "tinyocr": tinyocr,
}

# Monocular depth estimators (fourteenth task family): fn(x
# [N,H,W,3] in [0,1], num_classes=0, train=) -> [N,H,W,1] metric
# depth in meters, f32 (inverse-depth sigmoid head; models/depth.py).
DEPTH_MODELS = {
    "depth_unet": depth_unet,
    "tinydepth": tinydepth,
}

# Optical-flow estimators (fifteenth task family): fn(x [N,H,W,6]
# channel-stacked frame pair in [0,1], num_classes=0, train=) ->
# [N,H,W,2] flow in pixels, f32 (models/flow.py).
FLOW_MODELS = {
    "flownet_s": flownet_s,
    "flownet_c": flownet_c,
    "pwcnet": pwcnet,
    "tinyflow": tinyflow,
    "tinypwc": tinypwc,
}

# SiamFC trackers (sixteenth task family): fn(x [N,H,W,6] blob —
# search crop in ch 0-2, exemplar padded top-left in ch 3-5,
# num_classes=0, train=) -> [N,R,R] f32 response logits
# (models/tracking.py).
TRACK_MODELS = {
    "siamfc": siamfc,
    "tinysiamfc": tinysiamfc,
}

# Self-supervised pretraining forwards (train/ssl.py; fifth task
# family).  MAE entries are (x, *, train, features_only, ...) — not
# classifiers, so they live outside get_model()'s tables; SimCLR reuses
# any feature-tagging CLASSIFIERS entry as its backbone.
SSL_MODELS = {
    "mae_b16": mae_b16,
    "mae_l16": mae_l16,
    "tinymae": tinymae,
}

GAN_GENERATORS = {
    "dcgan": dcgan_generator,
    "pix2pix": unet_generator,
    "cyclegan": resnet_generator,
}

GAN_DISCRIMINATORS = {
    "dcgan": dcgan_discriminator,
    "pix2pix": patchgan_discriminator,
    "cyclegan": patchgan_discriminator,
}


def list_models(kind: str | None = None) -> list[str]:
    """Registry names.  kind: 'classifier' | 'segmenter' | 'detector' |
    'gan'; None lists everything get_model() resolves (classifiers +
    segmenters + detectors — GAN generators pair with discriminators,
    ask for kind='gan' explicitly)."""
    tables = {"classifier": CLASSIFIERS, "segmenter": SEGMENTERS,
              "detector": DETECTORS, "gan": GAN_GENERATORS,
              "ssl": SSL_MODELS, "sr": SR_MODELS,
              "diffusion": DIFFUSION_MODELS, "video": VIDEO_MODELS,
              "embedding": EMBEDDING_MODELS, "audio": AUDIO_MODELS,
              "style": STYLE_MODELS, "ocr": OCR_MODELS,
              "depth": DEPTH_MODELS, "flow": FLOW_MODELS,
              "tracking": TRACK_MODELS}
    if kind is None:
        return (sorted(CLASSIFIERS) + sorted(SEGMENTERS)
                + sorted(DETECTORS) + sorted(SR_MODELS))
    try:
        return sorted(tables[kind])
    except KeyError as e:
        raise ValueError(f"unknown kind {kind!r}; valid: "
                         f"{sorted(tables)}") from e


def get_model(name: str):
    for table in (CLASSIFIERS, SEGMENTERS, DETECTORS, SR_MODELS):
        if name in table:
            return table[name]
    raise ValueError(f"unknown model {name!r}; valid: "
                     f"{sorted(CLASSIFIERS) + sorted(SEGMENTERS) + sorted(DETECTORS) + sorted(SR_MODELS)}")
