"""Functional model zoo with prior-parameterized layers."""
from .base import (ClassificationModel, Model, Module, RegressionModel)
from .layers import (AvgPool2d, BatchNorm2d, Conv2d, Flatten, GlobalAvgPool,
                     Identity, Linear, MaxPool2d, ReLU, Reshape, Sequential)
from .dense_nets import (ClassificationDenseNet, DenseNet, LinearNealNormal,
                         LinearPrior, LinearRegression, LogisticRegression)
from .conv_nets import (ClassificationConvNet, Conv2dPrior,
                        CorrelatedClassificationConvNet, PreActBlock,
                        PreActResNet, PreActResNet18, PreActResNet34,
                        ThinPreActResNet18)
from .google_resnet import BasicBlock, CorrelatedResNet, ResNet
from .prior_only import GaussianModel, NealFunnel, NealFunnelT, PriorOnlyModel
from .raob import RaoBDenseNet, RaoBLinearRegression, RaoBRegressionModel
from .data_driven import (DataDrivenDoubleGammaClassificationConvNet,
                          DataDrivenGaussianClassificationConvNet,
                          DataDrivenMVTGoogleResNet, DataDrivenPreActResNet18,
                          DecreasingMVTGoogleResNet, replace_prior)
