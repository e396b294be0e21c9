"""Model zoo for tests, examples, and benchmarks."""

from __future__ import annotations

from kfac_pytorch_tpu.models.cifar_resnet import CifarResNet as CifarResNet
from kfac_pytorch_tpu.models.cifar_resnet import resnet20 as resnet20
from kfac_pytorch_tpu.models.cifar_resnet import resnet32 as resnet32
from kfac_pytorch_tpu.models.cifar_resnet import resnet44 as resnet44
from kfac_pytorch_tpu.models.cifar_resnet import resnet56 as resnet56
from kfac_pytorch_tpu.models.cifar_resnet import resnet110 as resnet110
from kfac_pytorch_tpu.models.simple import LeNet as LeNet
from kfac_pytorch_tpu.models.simple import TinyModel as TinyModel
