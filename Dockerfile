# Deployment recipe mirroring the reference's two-stage shape
# (/root/reference/Dockerfile: a `base` build + thin service targets).
# Build stage compiles the thin app jar with sbt; the runtime stage is
# any public Apache Spark 4.x image (Scala 2.13 + JDK 17) — it supplies
# /opt/spark/jars, so the app jar stays ~2 MB. Substitute your registry's
# blessed Spark image for the FROM below; nothing here depends on a
# specific patch tag.
#
#   docker build \
#     --build-context spark=docker-image://apache/spark:4.0.0-scala2.13-java17-ubuntu \
#     -t graft .
#   docker run -p 8080:8080 -p 8081:8081 -v $PWD/data:/data graft \
#     /data/layers.parquet 8080 8081
#
# (the --build-context flag is REQUIRED: the build stage copies
# /opt/spark/jars from the named `spark` context; plain `docker build`
# fails at that COPY --from=spark line)
#
# (This container image is a recipe verified by the tested non-container
# path — tools/mkdist.sh + dist/bin/graft-serve — since the build host
# for this repo has no docker daemon or registry egress.)

FROM sbtscala/scala-sbt:eclipse-temurin-17.0.10_7_1.9.9_2.13.13 AS build
WORKDIR /app
COPY build.sbt ./
COPY project/build.properties project/
COPY src/main src/main
# the repo builds against an unmanaged Spark jar dir; in a registry build
# the Spark image's jars are mounted/copied to the same path
COPY --from=spark /opt/spark/jars /opt/spark/jars
RUN sbt -batch package

FROM apache/spark:4.0.0-scala2.13-java17-ubuntu AS runtime
# alias the base image so the build stage can copy its jars
# (docker build --build-context spark=docker-image://apache/spark:4.0.0-scala2.13-java17-ubuntu)
USER root
COPY --from=build /app/target/scala-2.13/*_2.13-*.jar /opt/graft/graft.jar
COPY tools/mkdist.sh /opt/graft/mkdist.sh
COPY docker/entrypoint.sh /opt/graft/entrypoint.sh
RUN chmod +x /opt/graft/entrypoint.sh && chown -R spark /opt/graft
USER spark
EXPOSE 8080 8081
ENTRYPOINT ["/opt/graft/entrypoint.sh"]
