from setuptools import find_packages, setup

setup(
    name="davar_lab_ocr_spark",
    version="0.1.0",
    description=(
        "PySpark-native document-content extraction engine "
        "(DAVAR-Lab-OCR semantics, Spark-first execution)"
    ),
    packages=find_packages(include=["davar_lab_ocr_spark", "davar_lab_ocr_spark.*"]),
    python_requires=">=3.10",
    install_requires=["pyspark>=3.5", "numpy", "pandas", "pyarrow"],
)
