from medical_image_segmentation_tpu.data.dicom import DicomFile, read_dicom, UnsupportedTransferSyntax
from medical_image_segmentation_tpu.data.nifti import NiftiFile, read_nifti

__all__ = ["DicomFile", "read_dicom", "UnsupportedTransferSyntax", "NiftiFile", "read_nifti"]
