BEGIN TRANSACTION;
CREATE TABLE "forest_area" (
"country_code" TEXT,
  "country_name" TEXT,
  "year" INTEGER,
  "forest_area_sqkm" REAL
);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2016,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2015,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2014,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2013,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2012,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2011,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2010,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2009,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2008,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2007,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2006,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2005,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2004,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2003,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2002,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2001,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',2000,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',1999,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',1998,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',1997,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',1996,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',1995,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',1994,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',1993,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',1992,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',1991,4.199999869);
INSERT INTO "forest_area" VALUES('ABW','Aruba',1990,4.199999869);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2016,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2015,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2014,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2013,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2012,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2011,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2010,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2009,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2008,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2007,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2006,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2005,13500.0);
INSERT INTO "forest_area" VALUES('AFG','Afghanistan',2004,13500.0);
CREATE TABLE "land_area" (
"country_code" TEXT,
  "country_name" TEXT,
  "year" INTEGER,
  "total_area_sq_mi" REAL
);
INSERT INTO "land_area" VALUES('ABW','Aruba',2016,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2015,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2014,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2013,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2012,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2011,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2010,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2009,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2008,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2007,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2006,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2005,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2004,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2003,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2002,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2001,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',2000,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',1999,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',1998,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',1997,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',1996,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',1995,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',1994,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',1993,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',1992,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',1991,69.5);
INSERT INTO "land_area" VALUES('ABW','Aruba',1990,69.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2016,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2015,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2014,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2013,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2012,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2011,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2010,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2009,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2008,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2007,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2006,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2005,252069.5);
INSERT INTO "land_area" VALUES('AFG','Afghanistan',2004,252069.5);
CREATE TABLE "regions" (
"country_name" TEXT,
  "country_code" TEXT,
  "region" TEXT,
  "income_group" TEXT
);
INSERT INTO "regions" VALUES('Afghanistan','AFG','South Asia','Low income');
INSERT INTO "regions" VALUES('Albania','ALB','Europe & Central Asia','Upper middle income');
INSERT INTO "regions" VALUES('Algeria','DZA','Middle East & North Africa','Upper middle income');
INSERT INTO "regions" VALUES('American Samoa','ASM','East Asia & Pacific','Upper middle income');
INSERT INTO "regions" VALUES('Andorra','AND','Europe & Central Asia','High income');
INSERT INTO "regions" VALUES('Angola','AGO','Sub-Saharan Africa','Lower middle income');
INSERT INTO "regions" VALUES('Antigua and Barbuda','ATG','Latin America & Caribbean','High income');
INSERT INTO "regions" VALUES('Argentina','ARG','Latin America & Caribbean','High income');
INSERT INTO "regions" VALUES('Armenia','ARM','Europe & Central Asia','Upper middle income');
INSERT INTO "regions" VALUES('Aruba','ABW','Latin America & Caribbean','High income');
INSERT INTO "regions" VALUES('Australia','AUS','East Asia & Pacific','High income');
INSERT INTO "regions" VALUES('Austria','AUT','Europe & Central Asia','High income');
INSERT INTO "regions" VALUES('Azerbaijan','AZE','Europe & Central Asia','Upper middle income');
INSERT INTO "regions" VALUES('Bahamas, The','BHS','Latin America & Caribbean','High income');
INSERT INTO "regions" VALUES('Bahrain','BHR','Middle East & North Africa','High income');
INSERT INTO "regions" VALUES('Bangladesh','BGD','South Asia','Lower middle income');
INSERT INTO "regions" VALUES('Barbados','BRB','Latin America & Caribbean','High income');
INSERT INTO "regions" VALUES('Belarus','BLR','Europe & Central Asia','Upper middle income');
INSERT INTO "regions" VALUES('Belgium','BEL','Europe & Central Asia','High income');
INSERT INTO "regions" VALUES('Belize','BLZ','Latin America & Caribbean','Upper middle income');
INSERT INTO "regions" VALUES('Benin','BEN','Sub-Saharan Africa','Low income');
INSERT INTO "regions" VALUES('Bermuda','BMU','North America','High income');
INSERT INTO "regions" VALUES('Bhutan','BTN','South Asia','Lower middle income');
INSERT INTO "regions" VALUES('Bolivia','BOL','Latin America & Caribbean','Lower middle income');
INSERT INTO "regions" VALUES('Bosnia and Herzegovina','BIH','Europe & Central Asia','Upper middle income');
INSERT INTO "regions" VALUES('Botswana','BWA','Sub-Saharan Africa','Upper middle income');
INSERT INTO "regions" VALUES('Brazil','BRA','Latin America & Caribbean','Upper middle income');
INSERT INTO "regions" VALUES('British Virgin Islands','VGB','Latin America & Caribbean','High income');
INSERT INTO "regions" VALUES('Brunei Darussalam','BRN','East Asia & Pacific','High income');
INSERT INTO "regions" VALUES('Bulgaria','BGR','Europe & Central Asia','Upper middle income');
INSERT INTO "regions" VALUES('Burkina Faso','BFA','Sub-Saharan Africa','Low income');
INSERT INTO "regions" VALUES('Burundi','BDI','Sub-Saharan Africa','Low income');
INSERT INTO "regions" VALUES('Cabo Verde','CPV','Sub-Saharan Africa','Lower middle income');
INSERT INTO "regions" VALUES('Cambodia','KHM','East Asia & Pacific','Lower middle income');
INSERT INTO "regions" VALUES('Cameroon','CMR','Sub-Saharan Africa','Lower middle income');
INSERT INTO "regions" VALUES('Canada','CAN','North America','High income');
INSERT INTO "regions" VALUES('Cayman Islands','CYM','Latin America & Caribbean','High income');
INSERT INTO "regions" VALUES('Central African Republic','CAF','Sub-Saharan Africa','Low income');
INSERT INTO "regions" VALUES('Chad','TCD','Sub-Saharan Africa','Low income');
INSERT INTO "regions" VALUES('Channel Islands','CHI','Europe & Central Asia','High income');
COMMIT;
