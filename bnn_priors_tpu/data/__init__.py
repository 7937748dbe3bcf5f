"""Datasets: UCI, MNIST family, CIFAR-10 family, SVHN, toys."""
from .base import DataContainer, Dataset
from .uci import UCI
from .mnist import FakeMNIST, FashionMNIST, MNIST, RotatedMNIST
from .cifar import (CIFAR10, CIFAR10_C, CIFAR10Augmented, CIFAR10Small,
                    FakeCIFAR10, SVHN, random_crop_flip)
from .toy import RandomData, RandomOODTestData, Synthetic
